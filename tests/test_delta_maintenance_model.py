"""Model-based randomized differential for the Delta maintenance
surface (r9): a random sequence of append / checkpoint / cleanup /
OPTIMIZE operations runs against BOTH the real exporter/reader and a
trivial Python model (per-version row multisets). After every step
the full read and every still-reconstructable version_as_of read must
equal the model, and versions whose JSON commits were cleaned must
raise — the maintenance ops may never change WHAT a version contains,
only how it is stored.
"""

from __future__ import annotations

import random
from collections import Counter

import pytest

from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.delta_interop import (
    UnsupportedDeltaFeature,
    cleanup_log,
    export_delta,
    optimize_delta,
    read_delta,
    write_checkpoint,
)


def _rows_of(df):
    return Counter(map(tuple, df.collect()))


@pytest.mark.parametrize("seed", [3, 11, 27])
def test_random_maintenance_sequences_match_model(spark, tmp_path, seed):
    rng = random.Random(seed)
    path = str(tmp_path / f"delta_model_{seed}")
    mk = lambda rows: spark.createDataFrame(rows, "id long, v string")
    next_id = 0

    def fresh_rows(n):
        nonlocal next_id
        out = [(next_id + i, f"v{next_id + i}") for i in range(n)]
        next_id += n
        return out

    base = fresh_rows(3)
    export_delta(mk(base), path)
    versions: list[Counter] = [Counter(base)]  # model: rows AT version i
    reconstructable = {0}
    checkpointed = -1
    cps_on_disk: set[int] = set()  # checkpoint FILES survive cleanup

    ops = ["append", "append", "optimize", "checkpoint", "cleanup"]
    for step in range(12):
        op = rng.choice(ops)
        if op == "append":
            rows = fresh_rows(rng.randint(1, 4))
            export_delta(mk(rows), path, mode="append")
            versions.append(versions[-1] + Counter(rows))
            reconstructable.add(len(versions) - 1)
        elif op == "optimize":
            res = optimize_delta(spark, path)
            assert res["version"] == len(versions)
            versions.append(Counter(versions[-1]))  # values unchanged
            reconstructable.add(len(versions) - 1)
        elif op == "checkpoint":
            info = write_checkpoint(spark, path)
            assert info["version"] == len(versions) - 1
            checkpointed = info["version"]
            cps_on_disk.add(checkpointed)
        else:  # cleanup
            if checkpointed < 0:
                with pytest.raises(
                    UnsupportedDeltaFeature, match="checkpoint"
                ):
                    cleanup_log(path)
            else:
                cleanup_log(path)
                # versions below the pointer survive only where a
                # checkpoint FILE anchors them exactly (cleanup
                # deletes json commits, never checkpoint parquets)
                reconstructable &= (
                    set(range(checkpointed, len(versions)))
                    | cps_on_disk
                )
        # invariant: the live read equals the model's newest version
        assert _rows_of(read_delta(spark, path)) == versions[-1], (
            seed, step, op,
        )
        # spot-check two versions: one reconstructable, one cleaned
        probe = rng.sample(sorted(reconstructable), 1) + (
            rng.sample(
                sorted(set(range(len(versions))) - reconstructable), 1
            )
            if set(range(len(versions))) - reconstructable
            else []
        )
        for v in probe:
            if v in reconstructable:
                got = _rows_of(read_delta(spark, path, version_as_of=v))
                assert got == versions[v], (seed, step, op, v)
            else:
                with pytest.raises(
                    UnsupportedDeltaFeature, match="reconstructable"
                ):
                    read_delta(spark, path, version_as_of=v)
