"""Subtitle extraction (SRT / WebVTT) — pure JVM-side column math.

A video training corpus's TEXT usually arrives as subtitle sidecars;
extracting aligned (start_ms, end_ms, text) cues is the text-side
complement of ``operators/avi.py``/``mp4.py``'s frame sampling. Both
formats are public, line-oriented specs:

- SRT: blank-line-separated blocks of ``index`` / ``HH:MM:SS,mmm -->
  HH:MM:SS,mmm`` / text lines.
- WebVTT: a ``WEBVTT`` header, then cue blocks whose timing line uses
  ``.`` for millis and may omit hours; optional cue identifiers and
  ``NOTE`` comment blocks.

The parse is Spark BUILT-INS end to end — split on blank lines,
``posexplode`` per cue, ``regexp_extract`` for the timing — so it
whole-stage-codegens and scales as a map-only operator: no Python in
the hot path, one output row per cue, order preserved by the cue
position index. Malformed blocks (no timing line) drop out via the
regex returning '' — the tolerant behavior real subtitle pipelines
need on crawled data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TS = r"(?:(\d{1,2}):)?(\d{2}):(\d{2})[,.](\d{3})"
_TIMING = _TS + r"\s*-->\s*" + _TS


def _ts_ms(block: Column, group_off: int) -> Column:
    """Timing-line capture groups -> epoch-free milliseconds."""
    # try_cast: non-cue blocks extract '' — they must become NULL
    # (and get filtered), not an ANSI cast error
    h = F.regexp_extract(block, _TIMING, group_off + 1).try_cast("long")
    m = F.regexp_extract(block, _TIMING, group_off + 2).try_cast("long")
    s = F.regexp_extract(block, _TIMING, group_off + 3).try_cast("long")
    ms = F.regexp_extract(block, _TIMING, group_off + 4).try_cast("long")
    return (
        F.coalesce(h, F.lit(0)) * 3600000
        + m * 60000
        + s * 1000
        + ms
    )


def parse_subtitles(
    df: DataFrame, col: str, id_cols: list[str] | None = None
) -> DataFrame:
    """Explode a column of SRT or WebVTT documents into one row per
    cue: ``(*id_cols, cue_idx, start_ms, end_ms, text)``.

    Format auto-detected per document (``WEBVTT`` header). Cue text
    joins multi-line payloads with a single space; SRT numeric index
    lines, VTT cue ids, and ``NOTE`` blocks are dropped. Entirely
    ``split``/``posexplode``/``regexp_extract`` — map-only,
    whole-stage-codegen, no UDF."""
    id_cols = list(id_cols or [])
    body = F.regexp_replace(F.col(col), r"\r\n?", "\n")
    body = F.regexp_replace(body, r"^﻿?WEBVTT[^\n]*\n", "")
    blocks = F.split(body, r"\n\s*\n")
    e = df.select(
        *id_cols, F.posexplode(blocks).alias("cue_idx", "_block")
    )
    timing_re = _TIMING
    lines = F.filter(
        F.split(F.col("_block"), r"\n"),
        lambda l: F.trim(l) != "",
    )
    # the cue's text = lines AFTER the timing line
    timing_pos = F.array_position(
        F.transform(
            lines, lambda l: l.rlike(timing_re).cast("int")
        ),
        1,
    )
    text = F.array_join(
        F.slice(
            lines,
            (timing_pos + 1).cast("int"),
            F.greatest(
                F.size(lines) - timing_pos.cast("int"), F.lit(0)
            ).cast("int"),
        ),
        " ",
    )
    timing_line = F.array_join(
        F.filter(lines, lambda l: l.rlike(timing_re)), " "
    )
    out = e.select(
        *id_cols,
        "cue_idx",
        _ts_ms(timing_line, 0).alias("start_ms"),
        _ts_ms(timing_line, 4).alias("end_ms"),
        text.alias("text"),
    ).filter(F.col("start_ms").isNotNull() & (F.col("text") != ""))
    # NOTE blocks have no timing -> start_ms null -> filtered above;
    # renumber cues densely per document in original order
    from pyspark.sql import Window

    w = Window.partitionBy(*id_cols).orderBy("cue_idx") if id_cols else (
        Window.orderBy("cue_idx")
    )
    return out.withColumn(
        "cue_idx", (F.row_number().over(w) - 1).cast("int")
    )
