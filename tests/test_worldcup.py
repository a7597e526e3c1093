"""Phase-4 parity tests: the World-Cup ELT DAG (plans/worldcup.py) built
from literal raw fixtures reproduces the reference's 27-table schema with
all declared constraints holding — the capability-parity showcase
(SURVEY.md Phase 4)."""

from __future__ import annotations

import pytest

from world_cup_duckdb_spark.plans import (
    CONSTRAINTS,
    build_worldcup,
    validate_worldcup,
)
from world_cup_duckdb_spark.plans.fixtures import raw_fixture


@pytest.fixture(scope="module")
def tables(spark):
    t = build_worldcup(spark, raw_fixture(spark))
    for df in t.values():
        df.cache()
    yield t
    for df in t.values():
        df.unpersist()


def test_all_schema_tables_built(tables):
    assert set(tables) == set(CONSTRAINTS)
    assert len(tables) == 27
    for name, df in tables.items():
        assert df.count() > 0, f"{name} is empty"


def test_all_constraints_hold(tables):
    assert validate_worldcup(tables) == {}


def test_stage_capitalization_and_type(tables):
    stages = {r["name"]: r["type"] for r in tables["stage"].collect()}
    assert stages == {"Group stage": "Group", "Final": "Knockout"}


def test_match_stage_detail_and_completed(tables):
    m = {r["id"]: r for r in tables["match"].collect()}
    assert m["M-2030-01"]["stage_detail"] == "Group A"
    # knockout detail: capitalized, trailing 's' dropped would apply to
    # plural stage names; 'final' → 'Final'
    assert m["M-2030-04"]["stage_detail"] == "Final"
    assert m["M-2030-01"]["completed"] == "FT"
    assert m["M-2030-04"]["completed"] == "PS"
    # penalty columns null unless a shootout happened
    assert m["M-2030-01"]["penalty_shootout_score"] is None
    assert m["M-2030-04"]["penalty_shootout_score"] == "4-3"
    assert m["M-2030-04"]["home_team_penalty_score"] == 4
    assert m["M-2030-01"]["datetime"].isoformat() == "2030-06-01T15:00:00"


def test_surrogate_keys_dense_and_deterministic(spark, tables):
    cities = sorted(r["id"] for r in tables["city"].collect())
    assert cities == ["CTY-1", "CTY-2"]
    # deterministic: rebuild gives identical key→name mapping
    rebuilt = build_worldcup(spark, raw_fixture(spark))
    assert sorted(map(tuple, tables["city"].select("id", "name").collect())) == sorted(
        map(tuple, rebuilt["city"].select("id", "name").collect())
    )


def test_event_melt_and_typing(tables):
    ev = tables["event"].collect()
    # 8 goals + 3 booking flags... bookings rows: (yellow), (yellow),
    # (second_yellow + sending_off → 2 events) + 2 substitutions
    assert len(ev) == 8 + 4 + 2
    ids = sorted(int(r["id"].removeprefix("EV-")) for r in ev)
    assert ids == list(range(1, len(ev) + 1)), "ids not dense"
    et = {r["id"]: r["super_type"] for r in
          tables["event_type"].collect()}
    supers = sorted(et[r["event_type_id"]] for r in ev)
    assert supers.count("goal") == 8
    assert supers.count("booking") == 4
    assert supers.count("substitution") == 2


def test_event_type_replace_all(tables):
    names = {r["name"] for r in tables["event_type"].collect()}
    # OP36 deviation: ALL underscores replaced
    assert "second yellow card" in names


def test_host_flag(tables):
    flags = {r["team_id"]: r["is_host"] for r in tables["tournament_team"].collect()}
    assert flags == {"T-1": True, "T-2": True, "T-3": False, "T-4": False}


def test_shirt_zero_nulled(tables):
    shirts = {r["player_id"]: r["shirt_number"]
              for r in tables["tournament_squad"].collect()}
    assert shirts["P-4"] is None
    assert shirts["P-1"] == "10"


def test_replay_self_join(tables):
    rows = [tuple(r) for r in tables["match_replay"].collect()]
    assert rows == [("M-2030-01", "M-2030-02")]


def test_group_standings_recompute(tables):
    perf = {r["team_id"]: r for r in
            tables["tournament_team_group_performance"].collect()}
    # Group A across 3 group matches (replay counts as played):
    # T-1 W+D=4pts, T-3 W=3pts, T-2 L+D=1pt, T-4 L=0pts
    assert perf["T-1"]["points"] == 4 and perf["T-1"]["position"] == 1
    assert perf["T-3"]["points"] == 3 and perf["T-3"]["position"] == 2
    assert perf["T-2"]["points"] == 1 and perf["T-2"]["position"] == 3
    assert perf["T-4"]["points"] == 0 and perf["T-4"]["position"] == 4
    assert perf["T-1"]["did_advance"] and perf["T-3"]["did_advance"]
    assert not perf["T-2"]["did_advance"]
    assert perf["T-1"]["goals_for"] == 3 and perf["T-1"]["goals_against"] == 2


def test_schedule_recompute(tables):
    sched = {r["stage_detail"]: r for r in
             tables["tournament_schedule"].collect()}
    grp = sched["Group A"]
    assert grp["n_matches"] == 3 and grp["n_teams"] == 4
    assert grp["n_replays"] == 1 and grp["n_scheduled"] == 2
    assert grp["sort_order"] == 1
    assert str(grp["start_date"]) == "2030-06-01"
    assert str(grp["end_date"]) == "2030-06-03"
    fin = sched["Final"]
    assert fin["n_matches"] == 1 and fin["n_teams"] == 2
    assert fin["sort_order"] == 2


def test_team_appearance_differentials(tables):
    ta = {(r["match_id"], r["team_id"]): r
          for r in tables["team_appearance"].collect()}
    r = ta[("M-2030-01", "T-1")]
    assert r["home_away"] == "home"
    assert r["goal_differential"] == 1
    r2 = ta[("M-2030-04", "T-3")]
    assert r2["home_away"] == "away"
    assert r2["penalties_differential"] == -1


def test_fk_violation_detected(spark, tables):
    # Break a FK on purpose: an event pointing at a ghost match must trip
    # the validator (the engine's replacement for DuckDB's insert abort).
    from pyspark.sql import functions as F

    broken = dict(tables)
    ghost = tables["event"].limit(1).withColumn("match_id", F.lit("M-GHOST"))
    broken["event"] = tables["event"].unionByName(ghost)
    problems = validate_worldcup(broken)
    assert "event" in problems
    assert any("match" in p for p in problems["event"])


@pytest.fixture(scope="module")
def dist_tables(spark):
    """One distributed-keys build shared by the scale-path tests (each
    full DAG build costs ~a minute of Catalyst + window work)."""
    return build_worldcup(spark, raw_fixture(spark), distributed_keys=True)


def test_distributed_keys_build_equals_window_build(tables, dist_tables):
    """distributed_keys=True must assign the EXACT event ids of the
    global-window build — the scale path changes the plan, never the
    result (operators/relational.py:surrogate_key_distributed)."""
    a = sorted(tuple(r) for r in tables["event"].collect())
    b = sorted(tuple(r) for r in dist_tables["event"].collect())
    assert a == b


def test_replicated_build_validator_clean_and_linear(spark, tables):
    """The WC-pipeline scale posture (scripts/wc_scale_check.py, small
    local mirror): an R×-replicated raw corpus builds validator-clean
    with distributed fact keys, fact tables grow exactly R×, and the
    derived dimensions stay 1×."""
    from world_cup_duckdb_spark.plans.fixtures import replicate_raw

    R = 4
    rep = build_worldcup(
        spark, replicate_raw(raw_fixture(spark), R), distributed_keys=True
    )
    assert validate_worldcup(rep) == {}
    for fact in ("event", "match", "team_appearance", "match_player"):
        assert rep[fact].count() == tables[fact].count() * R, fact
    for dim in ("confederation", "stage", "position", "city"):
        assert rep[dim].count() == tables[dim].count(), dim


def test_distributed_event_plan_has_no_fact_window(dist_tables):
    """With distributed_keys=True the event table's plan must carry no
    window over fact rows: the range shuffle + Arrow index already ran
    at (checkpointed) build time, and the only Window computes offsets
    over per-partition counts (tests/test_plans.py:
    test_scalable_surrogate_key_has_no_fact_window pattern, extended to
    the pipeline per VERDICT r2 item 5)."""
    # Probe a derived frame: the shared fixture has been executed by the
    # equality test, and an executed AQE queryExecution renders final +
    # initial plans (two trees), which would double-count Window. A
    # trivial select gets a fresh, unexecuted queryExecution over the
    # same build plan.
    df = dist_tables["event"].select("*")
    p = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    tree = p.split("\n\n")[0]
    assert "Scan ExistingRDD" in tree, p
    assert tree.count("Window") == 1, p
    win_detail = p.split(") Window")[1].split("\n\n")[0]
    assert "_pid" in win_detail, p
