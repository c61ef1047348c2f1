"""Streaming incremental near-duplicate detection: new documents are
checked against an AT-REST MinHash-LSH index before joining it.

Batch near-dup (``operators/dedup.minhash_lsh_pairs``) answers "which
pairs in this corpus collide" with one self-join. A training-data
INGEST pipeline needs the incremental form: documents arrive
continuously, and each micro-batch must be deduplicated against
everything already accepted — without rescanning the corpus. This is
the standard production shape (an LSH index at rest + delta probes),
composed here from the engine's own primitives:

- three upsert-lake tables hold the state: per-doc signatures, the
  banded LSH index ((band, bhash, doc_id) rows), and the accumulated
  match results;
- per micro-batch: signatures for the NEW docs only (map-side column
  math, one localCheckpoint), an equi-join of the batch's band keys
  against the index (the only corpus-sized touch — a hash join keyed
  by (band, bhash), never O(n²)), MinHash-estimate verification of
  the candidates, then three lake commits (matches, sigs, bands)
  with epoch-derived commit ids — replayed batches dedup downstream,
  the same exactly-once contract as the flagship runner;
- intra-batch pairs come from the batch self-join
  (``minhash_lsh_pairs`` on the delta alone), so the union of
  intra + cross matches equals what the batch operator would find on
  the full corpus (pinned by the parity test).

Scale: per batch the work is O(batch x bands) probe rows joined
against the index table; the index grows by O(batch x bands) rows
per batch and compacts/buckets like any lake table. Nothing ever
collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import (
    _portable_base,
    _portable_rehash,
    _rehash,
    minhash_lsh_pairs,
)
from ..functions.text import shingles as _shingles
from .upsert_sink import UpsertLakeTable
from ..operators.materialize import pin


class StreamingNearDupIndex:
    """Incremental MinHash-LSH corpus index (see module docstring)."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        num_hashes: int = 32,
        bands: int = 8,
        shingle_n: int = 3,
        jaccard_threshold: float = 0.5,
        num_buckets: int = 16,
        hash_family: str = "xxhash64",
    ):
        if num_hashes % bands:
            raise ValueError("bands must divide num_hashes")
        self.spark = spark
        self.num_hashes = num_hashes
        self.bands = bands
        self.r = num_hashes // bands
        self.shingle_n = shingle_n
        self.threshold = jaccard_threshold
        self.hash_family = hash_family
        self.sigs = UpsertLakeTable(
            spark, f"{path}/sigs", key="doc_id", num_buckets=num_buckets
        )
        self.band_index = UpsertLakeTable(
            spark,
            f"{path}/bands",
            key=["band", "bhash", "doc_id"],
            num_buckets=num_buckets,
        )
        self.matches = UpsertLakeTable(
            spark,
            f"{path}/matches",
            key=["doc_id", "dup_of"],
            num_buckets=num_buckets,
        )

    # -- signature / band-key column math (same family as the batch op) --

    def _sig_col(self, text_col):
        base_fn = (
            _portable_base if self.hash_family == "portable" else F.xxhash64
        )
        rehash = (
            _portable_rehash if self.hash_family == "portable" else _rehash
        )
        base = F.transform(
            _shingles(text_col, self.shingle_n), lambda s: base_fn(s)
        )
        return F.array(
            *[
                F.array_min(F.transform(base, rehash(i)))
                for i in range(self.num_hashes)
            ]
        )

    def _band_key(self, b: int):
        slots = [
            F.element_at("sig", b * self.r + j + 1) for j in range(self.r)
        ]
        if self.hash_family == "portable":
            return F.md5(
                F.concat_ws(",", *[s.cast("string") for s in slots])
            )
        return F.xxhash64(*slots)

    def _signatures(self, batch: DataFrame, text_col: str, id_col: str):
        sigs = batch.select(
            F.col(id_col).alias("doc_id"),
            self._sig_col(F.col(text_col)).alias("sig"),
        )
        # one materialization: the wide HOF expression must not be
        # re-evaluated under every downstream join side
        return sigs.transform(pin)

    def _banded(self, sigs: DataFrame) -> DataFrame:
        return sigs.select(
            "doc_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"),
                            self._band_key(b).cast("string").alias("bhash"),
                        )
                        for b in range(self.bands)
                    ]
                )
            ).alias("bk"),
        ).select("doc_id", "bk.band", "bk.bhash")

    # -- one micro-batch ---------------------------------------------------

    def apply(
        self,
        batch: DataFrame,
        text_col: str = "text",
        id_col: str = "doc_id",
        epoch_id: int | None = None,
    ) -> DataFrame:
        """Process one batch of new documents. Returns this batch's
        matches (doc_id, dup_of, est_jaccard) — ``doc_id`` is always
        the NEW document, ``dup_of`` the earlier one — and commits
        matches + signatures + band rows to the index tables."""
        if batch.isEmpty():  # no-data micro-batch: nothing to index
            idt = batch.schema[id_col].dataType.simpleString()
            return self.spark.createDataFrame(
                [], f"doc_id {idt}, dup_of {idt}, est_jaccard double"
            )
        est = F.aggregate(
            F.zip_with("sig", "old_sig", lambda x, y: (x == y).cast("int")),
            F.lit(0),
            lambda acc, x: acc + x,
        ) / F.lit(self.num_hashes)

        sigs = self._signatures(batch, text_col, id_col)
        banded = self._banded(sigs)
        # cross-batch candidates: batch band keys vs the at-rest index
        try:
            idx = self.band_index.snapshot().select(
                "band", "bhash", F.col("doc_id").alias("dup_of")
            )
            old_sigs = self.sigs.snapshot().select(
                F.col("doc_id").alias("dup_of"), F.col("sig").alias("old_sig")
            )
        except FileNotFoundError:
            idx = None
        if idx is not None:
            cand = (
                banded.join(idx, ["band", "bhash"])
                # a re-ingested doc_id collides with its own indexed
                # bands — self-pairs are not duplicates
                .filter(F.col("doc_id") != F.col("dup_of"))
                .select("doc_id", "dup_of")
                .dropDuplicates(["doc_id", "dup_of"])
            )
            cross = (
                cand.join(sigs, "doc_id")
                .join(old_sigs, "dup_of")
                .withColumn("est_jaccard", est)
                .filter(F.col("est_jaccard") >= self.threshold)
                .select(
                    "doc_id",
                    "dup_of",
                    F.round("est_jaccard", 4).alias("est_jaccard"),
                )
            )
        else:
            cross = None
        # intra-batch pairs: the batch self-join; the LATER id is the dup
        intra = minhash_lsh_pairs(
            batch,
            text_col,
            id_col,
            num_hashes=self.num_hashes,
            bands=self.bands,
            shingle_n=self.shingle_n,
            jaccard_threshold=self.threshold,
            hash_family=self.hash_family,
        ).select(
            F.col("id_b").alias("doc_id"),
            F.col("id_a").alias("dup_of"),
            "est_jaccard",
        )
        found = intra if cross is None else cross.unionByName(intra)
        found = found.transform(pin)

        suffix = "" if epoch_id is None else f"-{epoch_id}"
        if found.limit(1).count():
            self.matches.write(
                found, commit_id=None if epoch_id is None else f"nd-matches{suffix}"
            )
        self.sigs.write(
            sigs, commit_id=None if epoch_id is None else f"nd-sigs{suffix}"
        )
        self.band_index.write(
            banded, commit_id=None if epoch_id is None else f"nd-bands{suffix}"
        )
        return found

    def duplicates(self) -> DataFrame:
        """All accumulated matches (doc_id, dup_of, est_jaccard)."""
        return self.matches.snapshot().select(
            "doc_id", "dup_of", "est_jaccard"
        )


def stream_near_dup(
    spark: SparkSession,
    stream: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    checkpoint_dir: str | None = None,
    trigger: dict | None = None,
    **index_kwargs,
):
    """Continuous flavor: readStream -> foreachBatch -> apply. The
    epoch id keys every lake commit, so restarted/replayed batches
    dedup — exactly-once end to end."""
    index = StreamingNearDupIndex(spark, path, **index_kwargs)
    writer = stream.writeStream.foreachBatch(
        lambda b, e: index.apply(b, text_col, id_col, epoch_id=e)
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger:
        writer = writer.trigger(**trigger)
    return index, writer.start()
