"""Entity resolution (operators/entity.py): pair scoring spec,
clustering with singletons, survivorship rules."""
from __future__ import annotations

import pytest


RECORDS = [
    # (rec_id, block, name, phone, address)  — entity A: 3 variants
    (10, 1, "Acme Metals Corp", "25-989-741", "12 Dock Rd"),
    (11, 1, "acme metals corp inc", "25989741", "12 Dock Road Pier 4"),
    (12, 1, "ACME METALS CORP", None, "12 D"),          # name-only link
    # entity B: phone matches, names disjoint → phone evidence alone
    # (500) >= threshold 450
    (20, 1, "Blue Harbour Ltd", "77-111-222", "9 Quay St"),
    (21, 1, "BH Logistics", "77111222", "9 Quay Street"),
    # entity C: singleton (no evidence against anyone)
    (30, 1, "Cedar Freight", "55-000-111", "1 Yard Ln"),
    # entity D: same name tokens as A but different BLOCK → never paired
    (40, 2, "Acme Metals Corp", "25-989-741", "99 Other St"),
]


def _df(spark):
    return spark.createDataFrame(
        RECORDS, ["rec_id", "block_key", "name", "phone", "address"]
    )


def test_entity_pairs_score_spec(spark):
    from mgo_liveagent_data_pipeline_spark.operators.entity import entity_pairs

    got = {
        (r["id_a"], r["id_b"]): r["score_milli"]
        for r in entity_pairs(_df(spark)).collect()
    }
    # 10-11: phone eq (500) + jaccard {acme,metals,corp} vs +{inc}
    #        = 3/4 → 750 milli → 500*750//1000 = 375 → 875
    assert got[(10, 11)] == 875
    # 10-12: no phone (NULL side), names identical after lower → 500
    assert got[(10, 12)] == 500
    # 11-12: phone digits differ-vs-empty → 0; jac 3/4 → 375 < 450: absent
    assert (11, 12) not in got
    # 20-21: phone eq only, names disjoint → 500
    assert got[(20, 21)] == 500
    # cross-entity and cross-block pairs never appear
    assert all(a // 10 == b // 10 for a, b in got)


def test_resolve_and_golden_records(spark):
    from mgo_liveagent_data_pipeline_spark.operators.entity import (
        golden_records,
        resolve_entities,
    )

    df = _df(spark)
    asg = resolve_entities(df)
    by_rec = {r["rec_id"]: (r["entity_id"], r["n_records"]) for r in asg.collect()}
    # A: 10,11,12 one entity (12 joins via the 10-12 name edge) — min id
    assert by_rec[10] == by_rec[11] == by_rec[12] == (10, 3)
    assert by_rec[20] == by_rec[21] == (20, 2)
    assert by_rec[30] == (30, 1)  # singleton keeps itself
    assert by_rec[40] == (40, 1)  # blocked away from A

    g = {
        r["entity_id"]: r
        for r in golden_records(
            df,
            asg,
            rules={
                "name": "first_by_key",
                "phone": "min",
                "address": "longest",
            },
        ).collect()
    }
    assert g[10]["name"] == "Acme Metals Corp"        # lowest-key record
    assert g[10]["phone"] == "25-989-741"             # min ignores NULL
    assert g[10]["address"] == "12 Dock Road Pier 4"  # longest
    assert g[30]["n_records"] == 1 and g[30]["name"] == "Cedar Freight"
    # longest tie-break is by value: two same-length addresses pick max
    assert g[20]["address"] == "9 Quay Street"


def test_oversized_block_refused(spark):
    from mgo_liveagent_data_pipeline_spark.operators.entity import entity_pairs

    df = _df(spark)
    with pytest.raises(ValueError, match="refine the blocking"):
        entity_pairs(df, max_block=3)
    with pytest.raises(ValueError, match="unknown survivorship"):
        from mgo_liveagent_data_pipeline_spark.operators.entity import (
            golden_records,
        )

        golden_records(df, df.select("rec_id"), rules={"name": "modal"})


def test_incremental_resolve_matches_full_batch_with_bridge_merge(spark):
    """The incremental contract: delta-only pair work reproduces the
    full-batch assignment exactly — INCLUDING the case a naive
    assign-to-nearest-entity incremental ER gets wrong, a delta record
    that BRIDGES two standing entities into one."""
    from mgo_liveagent_data_pipeline_spark.operators.entity import (
        incremental_resolve_entities,
        resolve_entities,
    )

    # standing corpus: entities {10,11} (phone) and {20,21} (phone),
    # plus singleton 30
    corpus = _df(spark).where("rec_id <> 12")
    corpus_asg = resolve_entities(corpus)
    # delta: 12 re-links to entity A by name; 15 carries BOTH phones'
    # digits in no field — instead bridge via names: share >=50% tokens
    # with A's name AND B's name is disjoint, so bridge through phone:
    # give 15 entity B's phone and entity A's name → merges A and B
    delta = spark.createDataFrame(
        [
            (12, 1, "ACME METALS CORP", None, "12 D"),
            (15, 1, "Acme Metals Corp", "77-111-222", "somewhere"),
        ],
        ["rec_id", "block_key", "name", "phone", "address"],
    )
    inc = {
        r["rec_id"]: (r["entity_id"], r["n_records"])
        for r in incremental_resolve_entities(
            corpus, delta, corpus_assignment=corpus_asg
        ).collect()
    }
    full = {
        r["rec_id"]: (r["entity_id"], r["n_records"])
        for r in resolve_entities(corpus.unionByName(delta)).collect()
    }
    assert inc == full
    # and the bridge really merged: A (10,11,12,15) ∪ B (20,21) → one
    # entity labelled 10 with 6 records
    assert inc[20] == (10, 6) and inc[15] == (10, 6)
    # the isolated-block record stays put
    assert inc[40] == (40, 1)

    # overlapping delta key refused
    with pytest.raises(ValueError):
        incremental_resolve_entities(
            corpus,
            corpus.limit(1),
            corpus_assignment=corpus_asg,
        ).collect()


MULTI = [
    # (rec_id, block_key, block_key2, name, phone)
    (10, 1, "2598", "Acme Metals Corp", "25-989-741"),
    (11, 1, "2598", "acme metals corp inc", "25989741"),
    # 13: re-type of A with a CORRUPTED block_key (9) — single-key
    # blocking can never pair it; its phone-prefix block still holds A
    (13, 9, "2598", "acme metals corp", "25 989 741"),
    (20, 1, "7711", "Blue Harbour Ltd", "77-111-222"),
    (30, 1, None, "Cedar Freight", None),  # no phone → pass-2 absent
]


def _multi_df(spark):
    return spark.createDataFrame(
        MULTI, ["rec_id", "block_key", "block_key2", "name", "phone"]
    )


def test_single_key_blocking_provably_misses_dirty_block(spark):
    """The round-10 contract: a record whose block key is corrupted is
    stranded by single-key blocking (the classic ER miss) and recovered
    by the union of passes — pinned side by side."""
    from mgo_liveagent_data_pipeline_spark.operators.entity import (
        resolve_entities,
    )

    df = _multi_df(spark)
    single = {
        r["rec_id"]: r["entity_id"]
        for r in resolve_entities(df, block_col="block_key").collect()
    }
    multi = {
        r["rec_id"]: r["entity_id"]
        for r in resolve_entities(
            df, block_col=["block_key", "block_key2"]
        ).collect()
    }
    # single-key: 13 is alone in block 9 → stranded singleton
    assert single[13] == 13 and single[10] == single[11] == 10
    # multi-pass: the phone-prefix pass recovers it (phone eq 500 +
    # name jac {acme,metals,corp}+{inc}: 750//1000*500... = 875 ≥ 450)
    assert multi[13] == 10 and multi[10] == multi[11] == 10
    # records outside both overlaps are unaffected by the second pass
    assert multi[20] == 20 and multi[30] == 30
    # NULL second key never joins: 30 stays a singleton even though
    # another NULL-key record exists
    df2 = df.unionByName(
        _multi_df(spark).where("rec_id = 30").selectExpr(
            "31 as rec_id", "2 as block_key",
            "cast(null as string) as block_key2",
            "'Cedar Freight' as name", "cast(null as string) as phone",
        )
    )
    multi2 = {
        r["rec_id"]: r["entity_id"]
        for r in resolve_entities(
            df2, block_col=["block_key", "block_key2"]
        ).collect()
    }
    assert multi2[30] == 30 and multi2[31] == 31


def test_incremental_multi_pass_matches_full_batch(spark):
    """Multi-pass incremental == multi-pass full batch, including a
    delta record reachable only through the SECOND pass."""
    from mgo_liveagent_data_pipeline_spark.operators.entity import (
        incremental_resolve_entities,
        resolve_entities,
    )

    blocks = ["block_key", "block_key2"]
    corpus = _multi_df(spark).where("rec_id <> 13")
    corpus_asg = resolve_entities(corpus, block_col=blocks)
    delta = _multi_df(spark).where("rec_id = 13")
    inc = {
        r["rec_id"]: (r["entity_id"], r["n_records"])
        for r in incremental_resolve_entities(
            corpus, delta, corpus_assignment=corpus_asg, block_col=blocks
        ).collect()
    }
    full = {
        r["rec_id"]: (r["entity_id"], r["n_records"])
        for r in resolve_entities(
            _multi_df(spark), block_col=blocks
        ).collect()
    }
    assert inc == full
    assert inc[13] == (10, 3)  # linked through pass 2 only
