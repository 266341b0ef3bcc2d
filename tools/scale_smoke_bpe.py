"""BPE batched-merge-learning smoke — the rounds ≪ merges evidence.

Trains the same vocab twice on the documents corpus: one merge per
driver round (the round-9 shape) vs batched top-N exact learning
(merges_per_round=16), asserts the merge tables are IDENTICAL, and
prints rounds + wall time for each. At a production 32k-merge vocab the
round count is the driver-job count — the thing being collapsed.

Usage: python tools/scale_smoke_bpe.py [num_merges]
Writes one JSON line; DESIGN.md records the row.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mgo_liveagent_data_pipeline_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    num_merges = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    spark = get_spark("scale_smoke_bpe")
    from mgo_liveagent_data_pipeline_spark.operators.textops import bpe_train

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    docs = docs.localCheckpoint(eager=True)

    out: dict = {"num_merges": num_merges}
    bpe_train(docs, 4)  # warm the code path

    for name, mpr in (("seq", 1), ("batched", 16)):
        st: dict = {}
        t0 = time.time()
        merges = bpe_train(docs, num_merges, merges_per_round=mpr, stats=st)
        out[name] = {
            "t": round(time.time() - t0, 2),
            "rounds": st["rounds"],
            "merges": len(merges),
        }
        out[f"_{name}_table"] = merges
        print(json.dumps({name: out[name]}), file=sys.stderr)

    assert out.pop("_seq_table") == out.pop("_batched_table"), (
        "batched table diverged from sequential"
    )
    out["rounds_ratio"] = round(
        out["seq"]["rounds"] / max(out["batched"]["rounds"], 1), 2
    )
    out["speedup"] = round(out["seq"]["t"] / max(out["batched"]["t"], 1e-9), 2)

    # The synthetic documents vocabulary is near-uniform — tie-heavy,
    # the worst case for exact batching (sharing ties defer to the
    # recount). Real text is ZIPFIAN: counts separate and the batch
    # fills. Same assertion, Zipf-weighted fixture:
    from pyspark.sql import functions as F

    # words over a 32-symbol alphabet (two differently-translated md5
    # halves) — a 16-symbol hex alphabet makes every pair share tokens
    # with every other, which caps EXACT batching at the alphabet, not
    # at merges_per_round; real text's intermediate tokens diversify
    # the same way
    hexd = "0123456789abcdef"
    word = F.concat(
        F.translate(
            F.substring(F.md5(F.col("id").cast("string")), 1, 4),
            hexd, "abcdefghijklmnop",
        ),
        F.translate(
            F.substring(F.md5(F.concat(F.col("id").cast("string"), F.lit("x"))), 1, 4),
            hexd, "qrstuvwxyz012345",
        ),
    )
    zipf = (
        spark.range(1, 600)
        .select(
            F.explode(
                F.array_repeat(
                    word, (F.lit(3000) / F.col("id")).cast("int") + 1
                )
            ).alias("text"),
            F.col("id").alias("doc_id"),
        )
        .localCheckpoint(eager=True)
    )
    for name, mpr in (("zipf_seq", 1), ("zipf_batched", 16)):
        st = {}
        t0 = time.time()
        merges = bpe_train(zipf, num_merges, merges_per_round=mpr, stats=st)
        out[name] = {
            "t": round(time.time() - t0, 2),
            "rounds": st["rounds"],
            "merges": len(merges),
        }
        out[f"_{name}_table"] = merges
        print(json.dumps({name: out[name]}), file=sys.stderr)
    assert out.pop("_zipf_seq_table") == out.pop("_zipf_batched_table")
    out["zipf_rounds_ratio"] = round(
        out["zipf_seq"]["rounds"] / max(out["zipf_batched"]["rounds"], 1), 2
    )

    # approximate batching (exact=False): the production-throughput
    # mode — rounds collapse toward merges ÷ merges_per_round
    st = {}
    t0 = time.time()
    m = bpe_train(zipf, num_merges, merges_per_round=16, exact=False, stats=st)
    out["zipf_approx"] = {
        "t": round(time.time() - t0, 2),
        "rounds": st["rounds"],
        "merges": len(m),
    }
    out["zipf_approx_rounds_ratio"] = round(
        out["zipf_seq"]["rounds"] / max(st["rounds"], 1), 2
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
