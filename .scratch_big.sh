#!/bin/bash
cd /root/repo
export SPINELINK_DRIVER_MEM=48g
for c in 8 32; do
  python .scratch_curve.py --worker $c 2500000 2>/dev/null | grep -a CURVE >> /tmp/big_scale.log
done
echo DONE >> /tmp/big_scale.log
