"""Python user-defined table functions (Spark 4 surface tier).

A UDTF is the engine-level form of "one input row → many derived
rows with their own schema": the reference does this shape in Python
loops over fetched pages (e.g. expanding a parent record into
per-link report rows, /root/reference/modules/report.py); Spark 4
declares it as a table function that composes with LATERAL so
Catalyst plans the correlation (one pass over the parent side, rows
generated inside the scan stage — no shuffle added by the expansion).

``WindowedChunks`` emits overlapping fixed-size word windows with a
stride — the training-data "context window with overlap" chunking
shape (the non-overlapping variant is already covered by
``document_chunks`` via built-in slice/explode; overlap is what the
built-ins do NOT express cleanly, which is the UDTF's job).

Arrow-batched (``useArrow=True``): batches of input rows cross the
JVM↔Python boundary as Arrow, not pickled rows — same discipline as
every mapInPandas operator in this repo.

NOTE for callers: ship this module BY VALUE before registering the
UDTF (``pyspark.cloudpickle.register_pickle_by_value``) — a UDTF
pickles by module reference by default, and executor Python workers
need not have this repo on sys.path (same rule as the paged
DataSource, sources/paged.py).
"""

from __future__ import annotations

CHUNK_SIZE = 30
CHUNK_STRIDE = 20


class WindowedChunks:
    """eval(text) → (pos, n_words, window_text) rows: word windows of
    ``CHUNK_SIZE`` starting every ``CHUNK_STRIDE`` words (overlap =
    size - stride), final partial window included.  Normalization
    matches the repo convention (lowercase, whitespace-run split) so
    the DuckDB oracle can mirror it with str_split."""

    def eval(self, text):  # noqa: A002 - UDTF contract signature
        if text is None:
            return
        words = text.lower().split()
        n = len(words)
        p = 0
        pos = 0
        while p < n:
            chunk = words[p : p + CHUNK_SIZE]
            yield pos, len(chunk), " ".join(chunk)
            p += CHUNK_STRIDE
            pos += 1
