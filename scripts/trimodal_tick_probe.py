"""TRIMODAL tick flatness probe (r13): stage the three-modality
indexes (thumbs, clips, recordings, soundtrack rips) on a 1x corpus
(sf0.001, 500 docs) and a 10x corpus (sf0.1, 5000 docs), then tick
the SAME fixed fresh-group delta against each and compare wall clock
— the claim under test is that tick cost scales with the DELTA, not
the maintained state (the cross-modal witness, extended to audio).

Usage: python scripts/trimodal_tick_probe.py [n_delta] [draws]
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from falcon_metrics_etl_spark.session import get_spark
from falcon_metrics_etl_spark.sources import load_table
from falcon_metrics_etl_spark.streaming.cross_modal_tick import (
    trimodal_ingest_tick,
    stage_trimodal_state,
)


def main() -> None:
    n_delta = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    draws = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("trimodal_tick_probe")
    # fixed delta: fresh content groups far beyond both corpora;
    # multiples of CM_THUMB_MOD/CM_TRACK_MOD land thumbnails and rips in every batch
    delta = spark.createDataFrame(
        [(10_000_000 + i,) for i in range(n_delta)], "doc_id long"
    ).persist()
    delta.count()

    results = {}
    for tag, sf_dir in (("1x", "/root/testdata/sf0.001"),
                        ("10x", "/root/testdata/sf0.1")):
        state = tempfile.mkdtemp(prefix=f"cm3_probe_{tag}_")
        base = load_table(spark, sf_dir, "documents").select("doc_id")
        stage_trimodal_state(spark, base, state, batch_id=0)
        trimodal_ingest_tick(spark, delta, state, batch_id=1)
        runs = []
        for _ in range(draws):
            t0 = time.time()
            trimodal_ingest_tick(spark, delta, state, batch_id=1)
            runs.append(time.time() - t0)
        med = sorted(runs)[len(runs) // 2]
        results[tag] = med
        print(f"{tag}: base={base.count()} docs, tick median "
              f"{med:.2f}s (runs: {['%.2f' % r for r in runs]})",
              flush=True)
        shutil.rmtree(state, ignore_errors=True)
    print(f"ratio 10x/1x: {results['10x'] / results['1x']:.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
