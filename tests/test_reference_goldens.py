"""The reference's three golden test sets, driven end-to-end through the
CLI (run x3 -> summarise x2 -> compare), asserting the exact report rows
of /root/reference/test/testset1.jl:26-37, testset2.jl:15-24 and
testset3.jl:11-25 on byte-identical input data.

Test set 1: construct a spine from influenza cases (4 entities), then
link all three health tables to that FROZEN spine.
Test set 2: construct the spine from all three tables while linking
(append-then-relink), growing it to 6 entities.
Test set 3: compare the two runs (spine set ops + per-event status grid).

Deliberate divergence from the reference reports: the "LINKAGE RUNS"
path-carrying header row is omitted (run paths live in the manifest);
everything else — spine counts, per-criteria link counts, unlinked
counts, cross-run status pairs — must match the goldens exactly.
"""

import pandas as pd
import pytest

from spinebasedrecordlinkage_jl_spark import cli

# Byte-identical copies of /root/reference/test/data/*.csv (test
# fixtures, not code).
EMERGENCY_CSV = """patientid,firstname,middlename,lastname,birthdate,presentationdate,hospitalid,campusid,primary_diagnosis
1,john,anthony,smith,1960-12-13,2018-11-02,A,1,dehydration
1,john,tony,smith,1960-12-13,2019-02-15,A,1,dehydration
1,john,,smithh,1960-12-13,2019-07-07,B,2,gastroenteritis
2,robert,andrew,jones,1988-04-29,2019-04-30,B,1,dehydration
1,michelle,georgia,hudson,1959-09-23,2019-05-31,C,1,broken wrist
"""

HOSPITAL_CSV = """patientid,firstname,middlename,lastname,birthdate,admissiondate,dischargedate,hospitalid,campusid,primary_diagnosis
1,john,anthony,smith,1960-12-13,2018-11-03,2018-11-04,A,1,influenza
1,john,anthony,smith,1960-12-13,2019-03-02,2019-03-04,A,1,gastroenteritis
2,robert,andrew,jones,1988-04-29,2019-05-19,2019-05-20,B,2,prolapsed disc
2,elizabeth,katherine,brown,1994-08-09,2019-06-02,2019-06-07,C,2,diabetes
2,michael,james,king,1981-01-17,2019-06-15,2019-06-19,A,1,emphysema
"""

INFLUENZA_CSV = """reportid,firstname,middlename,lastname,birthdate,reportdate,patient_postcode,diagnosis
1,john,anthony,smith,1960-12-13,2018-11-17,3000,influenza
2,john,tony,smith,1960-12-13,2019-02-01,3000,influenza
3,john,anthony,smithh,1960-12-13,2019-05-24,3001,influenza
4,rob,andrew,jones,1988-04-29,2019-03-14,3002,influenza
5,elizabeth,katherine,brown,1994-08-09,2018-10-12,3003,influenza
6,elizabeth,kath,brown,1994-08-09,2018-12-19,3003,influenza
7,eliza,kath,brown,1994-08-09,2019-03-03,3003,influenza
8,mary,margaret,mcdonald,1990-02-04,2019-08-21,3004,influenza
"""

SPINE_COLS = '["EntityId", "firstname", "middlename", "lastname", "birthdate"]'

TABLE_DECLS = {
    "influenza_cases": ("influenza_cases.csv", '["reportid"]'),
    "hospital_admissions": (
        "hospital_admissions.csv",
        '["hospitalid", "campusid", "admissiondate", "dischargedate", "patientid"]',
    ),
    "emergency_presentations": (
        "emergency_presentations.csv",
        '["hospitalid", "campusid", "presentationdate", "patientid"]',
    ),
}

# criteria in the reference's config order (global sequential ids)
CRIT_EXACT = """[[criteria]]
tablename = "{t}"
[criteria.exactmatch]
{pairs}
"""

CRIT_APPROX = """[[criteria]]
tablename = "{t}"
[criteria.exactmatch]
{pairs}
{approx}
"""


def _table_block(name: str, datadir) -> str:
    fname, pk = TABLE_DECLS[name]
    return (
        f'[[tables]]\nname = "{name}"\ndatafile = "{datadir}/{fname}"\n'
        f"primarykey = {pk}\n"
    )


def _approx(datacol: str, threshold: float) -> str:
    return (
        f'[[criteria.approxmatch]]\ndatacolumn = "{datacol}"\nspinecolumn = "{datacol}"\n'
        f'distancemetric = "levenshtein"\nthreshold = {threshold}\n'
    )


# the reference's four influenza criteria blocks, reused by all configs
def _influenza_criteria() -> str:
    return (
        CRIT_EXACT.format(
            t="influenza_cases",
            pairs='firstname = "firstname"\nmiddlename = "middlename"\n'
            'lastname = "lastname"\nbirthdate = "birthdate"',
        )
        + CRIT_EXACT.format(
            t="influenza_cases",
            pairs='firstname = "firstname"\nlastname = "lastname"\nbirthdate = "birthdate"',
        )
        + CRIT_APPROX.format(
            t="influenza_cases",
            pairs='firstname = "firstname"\nbirthdate = "birthdate"',
            approx=_approx("lastname", 0.3),
        )
        + CRIT_APPROX.format(
            t="influenza_cases",
            pairs='lastname = "lastname"\nbirthdate = "birthdate"',
            approx=_approx("firstname", 0.5),
        )
    )


def _emergency_criteria() -> str:
    return CRIT_EXACT.format(
        t="emergency_presentations",
        pairs='firstname = "firstname"\nlastname = "lastname"\nbirthdate = "birthdate"',
    ) + CRIT_APPROX.format(
        t="emergency_presentations",
        pairs='birthdate = "birthdate"',
        approx=_approx("firstname", 0.3) + _approx("lastname", 0.3),
    )


def _hospital_criteria() -> str:
    return CRIT_EXACT.format(
        t="hospital_admissions",
        pairs='firstname = "firstname"\nlastname = "lastname"\nbirthdate = "birthdate"',
    )


@pytest.fixture(scope="module")
def runs(spark, tmp_path_factory):
    """Execute run 1a (construct spine), 1b (link to frozen spine) and
    2 (construct + link everything) once for all three test sets."""
    base = tmp_path_factory.mktemp("goldens")
    datadir = base / "data"
    datadir.mkdir()
    (datadir / "emergency_presentations.csv").write_text(EMERGENCY_CSV)
    (datadir / "hospital_admissions.csv").write_text(HOSPITAL_CSV)
    (datadir / "influenza_cases.csv").write_text(INFLUENZA_CSV)

    # -- run 1a: construct_spine_from_influenza_cases.toml
    out1a = base / "run1a"
    cfg1a = f"""projectname = "influenza-cases-spine"
output_directory = "{out1a}"
append_to_spine = true
construct_entityid_from = ["firstname", "lastname", "birthdate"]
[spine]
datafile = ""
columns = {SPINE_COLS}
{_table_block("influenza_cases", datadir)}
{_influenza_criteria()}"""
    (base / "cfg1a.toml").write_text(cfg1a)
    assert cli.main(["run", str(base / "cfg1a.toml")]) == 0

    # -- run 1b: link_influenza_cases_to_events.toml (frozen spine)
    out1b = base / "run1b"
    cfg1b = f"""projectname = "influenza-cases-link"
output_directory = "{out1b}"
append_to_spine = false
[spine]
datafile = "{out1a}/output/spine"
columns = {SPINE_COLS}
{_table_block("emergency_presentations", datadir)}
{_table_block("hospital_admissions", datadir)}
{_table_block("influenza_cases", datadir)}
{_emergency_criteria()}
{_hospital_criteria()}
{_influenza_criteria()}"""
    (base / "cfg1b.toml").write_text(cfg1b)
    assert cli.main(["run", str(base / "cfg1b.toml")]) == 0

    # -- run 2: link_all_health_service_events.toml
    out2 = base / "run2"
    cfg2 = f"""projectname = "health-service-usage"
output_directory = "{out2}"
append_to_spine = true
construct_entityid_from = ["firstname", "lastname", "birthdate"]
[spine]
datafile = ""
columns = {SPINE_COLS}
{_table_block("hospital_admissions", datadir)}
{_table_block("emergency_presentations", datadir)}
{_table_block("influenza_cases", datadir)}
{_hospital_criteria()}
{_emergency_criteria()}
{_influenza_criteria()}"""
    (base / "cfg2.toml").write_text(cfg2)
    assert cli.main(["run", str(base / "cfg2.toml")]) == 0

    return base, str(out1a), str(out1b), str(out2)


def _rows(df: pd.DataFrame) -> set:
    return {tuple(r) for r in df.itertuples(index=False)}


def test_testset1_spine_from_influenza(runs, spark):
    base, out1a, out1b, _ = runs
    spine = spark.read.parquet(f"{out1a}/output/spine")
    assert spine.count() == 4  # testset1.jl:15

    outfile = str(base / "linkage_report.csv")
    assert cli.main(["summarise", out1b, outfile]) == 0
    got = _rows(pd.read_csv(outfile))
    expected = {  # testset1.jl:27-37 (minus the LINKAGE RUNS header row)
        ("spine", "existent", 4),
        ("emergency_presentations", "linked with criteria ID 1", 2),
        ("emergency_presentations", "linked with criteria ID 2", 1),
        ("emergency_presentations", "unlinked", 2),
        ("hospital_admissions", "linked with criteria ID 3", 3),
        ("hospital_admissions", "unlinked", 2),
        ("influenza_cases", "linked with criteria ID 4", 4),
        ("influenza_cases", "linked with criteria ID 5", 2),
        ("influenza_cases", "linked with criteria ID 6", 1),
        ("influenza_cases", "linked with criteria ID 7", 1),
    }
    assert got == expected


def test_testset2_spine_from_all_tables(runs, spark):
    base, _, _, out2 = runs
    outfile = str(base / "linkage_report2.csv")
    assert cli.main(["summarise", out2, outfile]) == 0
    got = _rows(pd.read_csv(outfile))
    expected = {  # testset2.jl:16-24
        ("spine", "existent", 6),
        ("hospital_admissions", "linked with criteria ID 1", 5),
        ("emergency_presentations", "linked with criteria ID 2", 4),
        ("emergency_presentations", "linked with criteria ID 3", 1),
        ("influenza_cases", "linked with criteria ID 4", 3),
        ("influenza_cases", "linked with criteria ID 5", 2),
        ("influenza_cases", "linked with criteria ID 6", 1),
        ("influenza_cases", "linked with criteria ID 7", 2),
    }
    assert got == expected


def test_testset3_compare_runs(runs):
    base, _, out1b, out2 = runs
    outfile = str(base / "linkage_comparison.csv")
    assert cli.main(["compare", out1b, out2, outfile]) == 0
    got = _rows(pd.read_csv(outfile))
    expected = {  # testset3.jl:12-25
        ("spine", "existent", "existent", 3),
        ("spine", "existent", "nonexistent", 1),
        ("spine", "nonexistent", "existent", 3),
        ("hospital_admissions", "linked with criteria ID 3", "linked with criteria ID 1", 3),
        ("hospital_admissions", "unlinked", "linked with criteria ID 1", 2),
        ("emergency_presentations", "linked with criteria ID 1", "linked with criteria ID 2", 2),
        ("emergency_presentations", "linked with criteria ID 2", "linked with criteria ID 3", 1),
        ("emergency_presentations", "unlinked", "linked with criteria ID 2", 2),
        ("influenza_cases", "linked with criteria ID 4", "linked with criteria ID 4", 3),
        ("influenza_cases", "linked with criteria ID 4", "linked with criteria ID 7", 1),
        ("influenza_cases", "linked with criteria ID 5", "linked with criteria ID 5", 2),
        ("influenza_cases", "linked with criteria ID 6", "linked with criteria ID 6", 1),
        ("influenza_cases", "linked with criteria ID 7", "linked with criteria ID 7", 1),
    }
    assert got == expected
