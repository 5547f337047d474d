"""OpenGov conviction-voting surface: the published votes and delegation
tables.

Reference behavior reproduced (substrate/substrateetl.js:2141-2306
dump_democracy):
- the convictionVoting.votingFor state scan yields one row per
  (account, track classID) holding a Casting or Delegating JSON blob
  (the api .toHuman() shape: capitalized variant keys, comma-grouped
  balance strings);
- Casting rows explode into per-poll vote rows (:2224-2274):
  Standard → aye OR nay = balance, votedesc = the vote direction;
  Split → aye + nay, votedesc = "Split"; SplitAbstain → aye + nay +
  abstain, votedesc = "SplitAbstain"; any other payload keeps zeros with
  a NULL votedesc (the reference logs "WEIRD" and still pushes the row);
- conviction multiplier (:2160-2168): None→0.1, Locked1x..6x→1..6,
  anything unmapped→1 (:2266); Split/SplitAbstain votes carry no
  conviction so they stay at the initialized "None" → 0.1;
- balances strip the toHuman comma grouping and decimalize by 10^10
  (:2267-2269 — the reference hardcodes the relay's 10 decimals);
  ayec/nayc = the decimalized value × the multiplier (:2270-2271);
- Delegating rows (:2276-2285) publish (conviction, target, balance,
  className) per (account, classID);
- track names from the classIDtoName literal map (:2142-2159).

Spark shape: the whole parse is JVM-side — one from_json against a
variant-tolerant schema (vote tuples land as array<string>, objects as
raw JSON strings), explode, then get_json_object over the per-vote
payload.  No Python, no shuffle: both tables are narrow maps over the
state scan; downstream aggregation keys on (class_id) or (account) as
the caller chooses.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# substrateetl.js:2142-2159 classIDtoName
TRACK_NAMES: dict[int, str] = {
    0: "Root",
    1: "Whitelisted Caller",
    10: "Staking Admin",
    11: "Treasurer",
    12: "Lease Admin",
    13: "Fellowship Admin",
    14: "General Admin",
    15: "Auction Admin",
    20: "Referendum Canceller",
    21: "Referendum Killer",
    30: "Small Tipper",
    31: "Big Tipper",
    32: "Small Spender",
    33: "Medium Spender",
    34: "Big Spender",
}

# substrateetl.js:2160-2168 convictionMap ("None" votes lock nothing and
# count at 0.1x; unmapped convictions fall back to 1 per :2266)
CONVICTION_MULT: dict[str, float] = {
    "None": 0.1,
    "Locked1x": 1.0,
    "Locked2x": 2.0,
    "Locked3x": 3.0,
    "Locked4x": 4.0,
    "Locked5x": 5.0,
    "Locked6x": 6.0,
}

_VOTING_SCHEMA = (
    "Casting struct<votes: array<array<string>>>,"
    " Delegating struct<balance: string, target: string, conviction: string>"
)


def _class_name(class_id: Column) -> Column:
    expr = None
    for cid, name in TRACK_NAMES.items():
        cond = class_id == cid
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return expr.otherwise(F.lit(None).cast("string"))


def _mult(conviction: Column) -> Column:
    expr = None
    for conv, m in CONVICTION_MULT.items():
        cond = conviction == conv
        expr = F.when(cond, F.lit(m)) if expr is None else expr.when(cond, F.lit(m))
    return expr.otherwise(F.lit(1.0))  # substrateetl.js:2266 fallback


def _num(raw: Column, decimals: int) -> Column:
    """Comma-grouped toHuman balance string → decimalized double
    (substrateetl.js:2267-2269: strip commas, / 10**10)."""
    return F.coalesce(
        F.regexp_replace(raw, ",", "").try_cast("double"), F.lit(0.0)
    ) / F.lit(float(10**decimals))


def conviction_votes_table(voting_state: DataFrame, decimals: int = 10) -> DataFrame:
    """votingFor state rows → the published per-poll votes table
    (substrateetl.js:2219-2295, upsert keys (account, classID, pollID)).

    Input columns: account (ss58 string), class_id (int), voting (the
    toHuman JSON blob).  Output one row per casting vote with the
    reference's exact column set: vote direction, raw + conviction-
    weighted aye/nay, abstain, track name, conviction.
    """
    p = voting_state.withColumn("__p", F.from_json("voting", _VOTING_SCHEMA))
    v = (
        p.where(F.col("__p.Casting").isNotNull())
        .select(
            "account",
            "class_id",
            F.explode("__p.Casting.votes").alias("__v"),
        )
        .where(F.size("__v") == 2)  # substrateetl.js:2239 length == 2 guard
    )
    payload = F.element_at("__v", 2)
    std = F.get_json_object(payload, "$.Standard")
    split = F.get_json_object(payload, "$.Split")
    sa = F.get_json_object(payload, "$.SplitAbstain")
    std_vote = F.get_json_object(payload, "$.Standard.vote.vote")
    conviction = F.when(
        std.isNotNull(),
        F.coalesce(F.get_json_object(payload, "$.Standard.vote.conviction"), F.lit("None")),
    ).otherwise(F.lit("None"))
    votedesc = (
        F.when(std.isNotNull() & std_vote.isin("Aye", "Nay"), std_vote)
        .when(split.isNotNull(), F.lit("Split"))
        .when(sa.isNotNull(), F.lit("SplitAbstain"))
        .otherwise(F.lit(None).cast("string"))
    )
    std_bal = _num(F.get_json_object(payload, "$.Standard.balance"), decimals)
    aye = (
        F.when(std.isNotNull() & (std_vote == "Aye"), std_bal)
        .when(split.isNotNull(), _num(F.get_json_object(payload, "$.Split.aye"), decimals))
        .when(sa.isNotNull(), _num(F.get_json_object(payload, "$.SplitAbstain.aye"), decimals))
        .otherwise(F.lit(0.0))
    )
    nay = (
        F.when(std.isNotNull() & (std_vote == "Nay"), std_bal)
        .when(split.isNotNull(), _num(F.get_json_object(payload, "$.Split.nay"), decimals))
        .when(sa.isNotNull(), _num(F.get_json_object(payload, "$.SplitAbstain.nay"), decimals))
        .otherwise(F.lit(0.0))
    )
    abstain = F.when(
        sa.isNotNull(), _num(F.get_json_object(payload, "$.SplitAbstain.abstain"), decimals)
    ).otherwise(F.lit(0.0))
    mult = _mult(conviction)
    return v.select(
        "account",
        "class_id",
        F.element_at("__v", 1).try_cast("int").alias("poll_id"),
        votedesc.alias("vote"),
        aye.alias("aye"),
        (aye * mult).alias("ayec"),
        nay.alias("nay"),
        (nay * mult).alias("nayc"),
        abstain.alias("abstain"),
        _class_name(F.col("class_id")).alias("class_name"),
        conviction.alias("conviction"),
    )


def delegations_table(voting_state: DataFrame, decimals: int = 10) -> DataFrame:
    """votingFor Delegating rows → the published delegation table
    (substrateetl.js:2276-2304, upsert keys (account, classID))."""
    p = voting_state.withColumn("__p", F.from_json("voting", _VOTING_SCHEMA))
    d = p.where(F.col("__p.Delegating").isNotNull())
    return d.select(
        "account",
        "class_id",
        F.col("__p.Delegating.conviction").alias("conviction"),
        F.col("__p.Delegating.target").alias("target"),
        _num(F.col("__p.Delegating.balance"), decimals).alias("balance"),
        _class_name(F.col("class_id")).alias("class_name"),
    )
