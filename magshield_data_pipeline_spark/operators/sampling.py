"""Deterministic corpus splitting and sampling ([EXT] training-data
tier).

Training corpora need splits and samples that are (a) reproducible
across runs and engines, (b) stable under corpus growth — a document's
split must never change because other documents arrived — and (c)
skew-free. All three fall out of keying the decision on a salted MD5 of
the document id: pure projection, no shuffle, no RNG state.

``rand(seed)`` fails (b): Spark's sample is partition-position
dependent, so re-partitioning or appending data reshuffles everyone's
assignment. Hash-based assignment is the production idiom.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _hash_byte(key: Column, salt: str) -> Column:
    """First byte (0..255) of md5(salt|key) — the uniform assignment
    die. conv() decodes the two leading hex chars JVM-side."""
    h = F.md5(F.concat_ws("|", F.lit(salt), key.cast("string")))
    return F.conv(F.substring(h, 1, 2), 16, 10).cast("int")


def split_assign(
    key: Column,
    train_pct: float = 0.8,
    val_pct: float = 0.1,
    salt: str = "split",
) -> Column:
    """'train' / 'val' / 'test' by thresholding the hash byte.
    Boundaries are floor(pct*256), matching the oracle SQL exactly."""
    train_hi = int(train_pct * 256)
    val_hi = train_hi + int(val_pct * 256)
    b = _hash_byte(key, salt)
    return (
        F.when(b < train_hi, "train").when(b < val_hi, "val").otherwise("test")
    )


def sample_flag(key: Column, rate: float = 0.2, salt: str = "sample") -> Column:
    """Deterministic Bernoulli(rate ≈ k/256) flag, independent of the
    split die by virtue of a different salt."""
    return _hash_byte(key, salt) < int(rate * 256)


def temperature_threshold(n_group: Column, n_min: Column) -> Column:
    """Per-group keep-threshold byte for temperature (α = 0.5) mixture
    sampling: rate = sqrt(n_min / n_group), so the smallest source keeps
    everything and larger sources are downsampled toward a balanced
    mix — the standard multi-source training-mixture reweighting.

    Every operation here (divide, sqrt, multiply, floor) is IEEE
    exactly-rounded, so the threshold is bit-identical across engines —
    which is why the rate is sqrt-shaped rather than the equivalent
    pow(n, α-1): pow is a libm transcendental whose last ulp differs by
    platform and would flake a cross-engine boundary comparison."""
    rate = F.sqrt(n_min.cast("double") / n_group.cast("double"))
    return F.floor(rate * 256).cast("long")


def mixture_keep(key: Column, threshold: Column, salt: str = "mix") -> Column:
    """Deterministic per-row keep decision against a per-group
    temperature threshold."""
    return _hash_byte(key, salt) < threshold


# ---------------------------------------------------------------------------
# Weighted sampling without replacement (Efraimidis–Spirakis, IPL 2006)

_ES_SCALE = 4294967296.0  # 2^32


def es_weight_key(key: Column, weight: Column, salt: str = "esample") -> Column:
    """Efraimidis–Spirakis sampling key: the k rows with the LARGEST
    ``u^(1/w)`` (u uniform per row) are an exact weighted sample
    without replacement — each row's inclusion probability is
    proportional to its weight. Ranking is equivalently by
    ``ln(u)/w`` (monotone transform), which avoids pow().

    Why a training pipeline wants it: quota/stratified sampling
    (``quota_stratified_sample``) draws uniformly WITHIN a group;
    this draws proportionally to a per-row weight (tokens, quality
    score, dedup-cluster size) — "sample 1M documents, long documents
    proportionally more often" — in one pass, no iteration, stable
    under corpus growth because u derives from a salted md5 of the id.

    Cross-engine determinism: u = (hash32 + 0.5) / 2^32 is exact
    arithmetic on an exact integer; ln() is the one transcendental, and
    it feeds a RANKING, not a threshold — the key is rounded to 9
    decimals (quantization identical in both engines unless the true
    value lies within float error of a .5e-9 boundary, ~1e-9/row odds)
    and ties break on the id downstream, unlike the boundary-compare
    case that bars pow() from :func:`temperature_threshold`.

    Rows with weight <= 0 or null get a null key (callers filter or
    rank them last) rather than an error.
    """
    h = F.md5(F.concat_ws("|", F.lit(salt), key.cast("string")))
    v = F.conv(F.substring(h, 1, 8), 16, 10).cast("double")
    u = (v + F.lit(0.5)) / F.lit(_ES_SCALE)
    w = F.when(weight.cast("double") > 0, weight.cast("double"))
    return F.round(F.log(u) / w, 9)


def es_weight_key_sql(key_expr: str, weight_expr: str, salt: str = "esample") -> str:
    """DuckDB twin of :func:`es_weight_key` (no conv(): the 8 leading
    md5 nibbles decode via strpos arithmetic, as in the simhash/CMS
    oracles)."""
    md5 = f"md5('{salt}|' || CAST({key_expr} AS VARCHAR))"
    nibs = " + ".join(
        f"(strpos('0123456789abcdef', substr({md5}, {i + 1}, 1)) - 1) "
        f"* {16 ** (7 - i)}.0"
        for i in range(8)
    )
    u = f"(({nibs}) + 0.5) / {_ES_SCALE}"
    w = f"(CASE WHEN CAST({weight_expr} AS DOUBLE) > 0 THEN CAST({weight_expr} AS DOUBLE) END)"
    return f"round(ln({u}) / {w}, 9)"
