"""Literal raw-corpus fixtures for the World-Cup DAG (FIXTURES.md part B).

A compact, referentially consistent slice shaped like the jfjelstul CSV
corpus the reference ingests: one tournament, four teams across two
confederations, a group stage with a replay pair, and a final decided on
penalties — enough rows to light up every branch of plans/worldcup.py
(stage_detail group vs singularized knockout, FT/ET/PS, penalty nulling,
own-goal/penalty event typing, melt flags, shirt-0 nulling, host flag,
replay self-join) while staying eyeball-small for tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_T = {
    "confederations": (
        "confederation_code string, confederation_name string, "
        "confederation_wikipedia_link string",
        [
            ("CONMEBOL", "Confederación Sudamericana de Fútbol", "wiki/CONMEBOL"),
            ("UEFA", "Union of European Football Associations", "wiki/UEFA"),
        ],
    ),
    "teams": (
        "team_id string, team_code string, team_name string, "
        "federation_name string, region_name string, confederation_code string, "
        "team_wikipedia_link string",
        [
            ("T-1", "ARG", "Argentina", "AFA", "South America", "CONMEBOL", "wiki/ARG"),
            ("T-2", "BRA", "Brazil", "CBF", "South America", "CONMEBOL", "wiki/BRA"),
            ("T-3", "FRA", "France", "FFF", "Europe", "UEFA", "wiki/FRA"),
            ("T-4", "GER", "Germany", "DFB", "Europe", "UEFA", "wiki/GER"),
        ],
    ),
    "players": (
        "player_id string, family_name string, given_name string, "
        "birth_date string, count_tournaments int, player_wikipedia_link string",
        [
            ("P-1", "Alvarez", "Ana", "2001-01-01", 2, "wiki/P1"),
            ("P-2", "Benitez", "Bruno", "2000-02-02", 1, "wiki/P2"),
            ("P-3", "Costa", "Caio", "1999-03-03", 3, "wiki/P3"),
            ("P-4", "Dias", "Davi", "1998-04-04", 1, "wiki/P4"),
            ("P-5", "Evra", "Emile", "1997-05-05", 2, "wiki/P5"),
            ("P-6", "Fabre", "Fleur", "1996-06-06", 1, "wiki/P6"),
            ("P-7", "Gruber", "Gerd", "1995-07-07", 2, "wiki/P7"),
            ("P-8", "Huber", "Hanna", "1994-08-08", 1, "wiki/P8"),
        ],
    ),
    "managers": (
        "manager_id string, family_name string, given_name string, country_name string",
        [
            ("M-1", "Iriarte", "Ines", "Argentina"),
            ("M-2", "Junior", "Joao", "Brazil"),
            ("M-3", "Klein", "Karl", "Germany"),
        ],
    ),
    "referees": (
        "referee_id string, family_name string, given_name string, "
        "country_name string, confederation_code string, referee_wikipedia_link string",
        [
            ("R-1", "Lopez", "Luz", "Argentina", "CONMEBOL", "wiki/R1"),
            ("R-2", "Muller", "Max", "Germany", "UEFA", "wiki/R2"),
        ],
    ),
    "stadiums": (
        "stadium_id string, stadium_name string, stadium_capacity int, "
        "stadium_wikipedia_link string, city_name string, country_name string",
        [
            ("S-1", "Estadio Uno", 50000, "wiki/S1", "Buenos Aires", "Argentina"),
            ("S-2", "Arena Dois", 60000, "wiki/S2", "Rio de Janeiro", "Brazil"),
        ],
    ),
    "tournaments": (
        "tournament_id string, tournament_name string, year int, "
        "start_date string, end_date string, count_teams int, winner string",
        [("WC-2030", "2030 World Cup", 2030, "2030-06-01", "2030-07-15", 4, "Argentina")],
    ),
    "tournament_stages": (
        "tournament_id string, stage_name string, group_stage int",
        [("WC-2030", "group stage", 1), ("WC-2030", "final", 0)],
    ),
    "matches": (
        "match_id string, tournament_id string, stage_name string, "
        "group_name string, home_team_id string, away_team_id string, "
        "match_name string, match_date string, match_time string, "
        "stadium_id string, extra_time int, penalty_shootout int, "
        "result string, score string, home_team_score int, away_team_score int, "
        "score_penalties string, home_team_score_penalties int, "
        "away_team_score_penalties int, replayed int, replay int",
        [
            ("M-2030-01", "WC-2030", "group stage", "Group A", "T-1", "T-2",
             "Argentina v Brazil", "2030-06-01", "15:00", "S-1", 0, 0,
             "home team win", "2-1", 2, 1, None, None, None, 1, 0),
            ("M-2030-02", "WC-2030", "group stage", "Group A", "T-1", "T-2",
             "Argentina v Brazil replay", "2030-06-03", "15:00", "S-1", 0, 0,
             "draw", "1-1", 1, 1, None, None, None, 0, 1),
            ("M-2030-03", "WC-2030", "group stage", "Group A", "T-3", "T-4",
             "France v Germany", "2030-06-02", "18:00", "S-2", 0, 0,
             "home team win", "1-0", 1, 0, None, None, None, 0, 0),
            ("M-2030-04", "WC-2030", "final", "not applicable", "T-1", "T-3",
             "Argentina v France", "2030-07-15", "20:00", "S-2", 1, 1,
             "penalty shootout", "1-1", 1, 1, "4-3", 4, 3, 0, 0),
        ],
    ),
    "awards": (
        "award_id string, award_name string, award_description string, "
        "year_introduced int",
        [("A-1", "Golden Ball", "Best player", 1982)],
    ),
    "award_winners": (
        "tournament_id string, award_id string, player_id string",
        [("WC-2030", "A-1", "P-1")],
    ),
    "squads": (
        "tournament_id string, team_id string, player_id string, "
        "shirt_number int, position_code string",
        [
            ("WC-2030", "T-1", "P-1", 10, "FW"),
            ("WC-2030", "T-1", "P-2", 1, "GK"),
            ("WC-2030", "T-2", "P-3", 9, "FW"),
            ("WC-2030", "T-2", "P-4", 0, "DF"),  # shirt 0 → null
            ("WC-2030", "T-3", "P-5", 7, "MF"),
            ("WC-2030", "T-3", "P-6", 2, "DF"),
            ("WC-2030", "T-4", "P-7", 8, "MF"),
            ("WC-2030", "T-4", "P-8", 3, "DF"),
        ],
    ),
    "player_appearances": (
        "match_id string, team_id string, player_id string, "
        "position_code string, starter int, captain int",
        [
            ("M-2030-01", "T-1", "P-1", "FW", 1, 1),
            ("M-2030-01", "T-2", "P-3", "FW", 1, 0),
            ("M-2030-02", "T-1", "P-1", "FW", 1, 1),
            ("M-2030-02", "T-2", "P-3", "FW", 0, 0),
            ("M-2030-03", "T-3", "P-5", "MF", 1, 1),
            ("M-2030-03", "T-4", "P-7", "MF", 1, 1),
            ("M-2030-04", "T-1", "P-1", "FW", 1, 1),
            ("M-2030-04", "T-3", "P-5", "MF", 1, 1),
        ],
    ),
    "goals": (
        "match_id string, team_id string, player_id string, minute_label string, "
        "minute_regulation int, minute_stoppage int, match_period string, "
        "own_goal int, penalty int",
        [
            ("M-2030-01", "T-1", "P-1", "12'", 12, 0, "first half", 0, 0),
            ("M-2030-01", "T-1", "P-1", "45'+2", 45, 2, "first half", 0, 1),
            ("M-2030-01", "T-2", "P-2", "60'", 60, 0, "second half", 1, 0),
            ("M-2030-02", "T-1", "P-1", "30'", 30, 0, "first half", 0, 0),
            ("M-2030-02", "T-2", "P-3", "70'", 70, 0, "second half", 0, 0),
            ("M-2030-03", "T-3", "P-5", "55'", 55, 0, "second half", 0, 0),
            ("M-2030-04", "T-1", "P-1", "20'", 20, 0, "first half", 0, 0),
            ("M-2030-04", "T-3", "P-5", "80'", 80, 0, "second half", 0, 0),
        ],
    ),
    "bookings": (
        "match_id string, team_id string, player_id string, minute_label string, "
        "minute_regulation int, minute_stoppage int, match_period string, "
        "yellow_card int, second_yellow_card int, red_card int, sending_off int",
        [
            ("M-2030-01", "T-2", "P-3", "33'", 33, 0, "first half", 1, 0, 0, 0),
            ("M-2030-04", "T-3", "P-6", "50'", 50, 0, "second half", 1, 0, 0, 0),
            ("M-2030-04", "T-3", "P-6", "88'", 88, 0, "second half", 0, 1, 0, 1),
        ],
    ),
    "substitutions": (
        "match_id string, team_id string, player_id string, minute_label string, "
        "minute_regulation int, minute_stoppage int, match_period string, "
        "going_off int, coming_on int",
        [
            ("M-2030-04", "T-1", "P-1", "90'", 90, 0, "second half", 1, 0),
            ("M-2030-04", "T-1", "P-2", "90'", 90, 0, "second half", 0, 1),
        ],
    ),
    "penalty_kicks": (
        "penalty_kick_id string, match_id string, team_id string, "
        "player_id string, converted int",
        [
            ("PK-1", "M-2030-04", "T-1", "P-1", 1),
            ("PK-2", "M-2030-04", "T-3", "P-5", 1),
            ("PK-3", "M-2030-04", "T-1", "P-2", 1),
            ("PK-4", "M-2030-04", "T-3", "P-6", 0),
        ],
    ),
    "team_appearances": (
        "match_id string, team_id string, opponent_id string, home_team int, "
        "result string, goals_for int, goals_against int, penalties_for int, "
        "penalties_against int",
        [
            ("M-2030-01", "T-1", "T-2", 1, "win", 2, 1, 0, 0),
            ("M-2030-01", "T-2", "T-1", 0, "lose", 1, 2, 0, 0),
            ("M-2030-02", "T-1", "T-2", 1, "draw", 1, 1, 0, 0),
            ("M-2030-02", "T-2", "T-1", 0, "draw", 1, 1, 0, 0),
            ("M-2030-03", "T-3", "T-4", 1, "win", 1, 0, 0, 0),
            ("M-2030-03", "T-4", "T-3", 0, "lose", 0, 1, 0, 0),
            ("M-2030-04", "T-1", "T-3", 1, "win", 1, 1, 4, 3),
            ("M-2030-04", "T-3", "T-1", 0, "lose", 1, 1, 3, 4),
        ],
    ),
    "qualified_teams": (
        "tournament_id string, team_id string, count_matches int, performance string",
        [
            ("WC-2030", "T-1", 4, "champions"),
            ("WC-2030", "T-2", 2, "group stage"),
            ("WC-2030", "T-3", 2, "runners-up"),
            ("WC-2030", "T-4", 1, "group stage"),
        ],
    ),
    "host_countries": (
        "tournament_id string, team_id string",
        [("WC-2030", "T-1"), ("WC-2030", "T-2")],
    ),
    "tournament_referees": (
        "tournament_id string, referee_id string",
        [("WC-2030", "R-1"), ("WC-2030", "R-2")],
    ),
    "tournament_managers": (
        "tournament_id string, team_id string, manager_id string",
        [
            ("WC-2030", "T-1", "M-1"),
            ("WC-2030", "T-2", "M-2"),
            ("WC-2030", "T-4", "M-3"),
        ],
    ),
}


def raw_fixture(spark: SparkSession) -> dict[str, DataFrame]:
    """All raw frames as literal DataFrames (OP04 shape)."""
    return {
        name: spark.createDataFrame(rows, schema) for name, (schema, rows) in _T.items()
    }


def replicate_raw(
    raw: dict[str, DataFrame], replication: int
) -> dict[str, DataFrame]:
    """Referentially-consistent R× blow-up of the raw corpus, for the
    WC-pipeline scale check (scripts/wc_scale_check.py).

    Every ``*_id`` column gets a per-replica suffix (``~rN``), so all
    id-keyed joins line up within a replica and never across replicas,
    and every id-keyed PK stays unique. Name/code columns (stage names,
    result strings, country/city/federation names, position codes) are
    NOT suffixed — the pipeline branches on their literal values, and
    leaving them shared keeps the derived dimensions (confederation,
    city, position, stage) bounded while the id-keyed tables grow R× —
    the same dims-stay-1×, facts-grow-R× direction scripts/
    scale_check.py uses, which is the skew-adversarial one (per-dim-key
    fan-in grows with R)."""
    from pyspark.sql import functions as F

    if replication <= 1:
        return dict(raw)
    # Name columns that act as JOIN KEYS to an id-suffixed entity must
    # shift with it: tournament.winner joins team by display name
    # (plans/worldcup.py tournament build), so team_name and winner
    # suffix together or the winner join fans out R× per tournament.
    extra_keys = {"teams": ["team_name"], "tournaments": ["winner"]}
    out: dict[str, DataFrame] = {}
    for name, df in raw.items():
        id_cols = [c for c in df.columns if c.endswith("_id")]
        id_cols += [c for c in extra_keys.get(name, []) if c in df.columns]
        if not id_cols:
            # Pure dimension source (confederations): no id to shift —
            # replicating verbatim would duplicate its natural keys and
            # fan out every code join downstream. It stays 1×, which is
            # also the scale-check posture (bounded dims, growing facts).
            out[name] = df
            continue
        reps = [df]
        for r in range(1, replication):
            rep = df
            for c in id_cols:
                # NULL ids stay NULL: concat propagates null, which is
                # exactly the carry-through the pipeline's null handling
                # expects.
                rep = rep.withColumn(c, F.concat(F.col(c), F.lit(f"~r{r}")))
            reps.append(rep)
        u = reps[0]
        for rep in reps[1:]:
            u = u.unionByName(rep)
        out[name] = u
    return out
