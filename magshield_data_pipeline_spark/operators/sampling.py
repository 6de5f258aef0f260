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
