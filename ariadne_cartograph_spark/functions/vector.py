"""Vector math over array<float/double> embedding columns —
native Column expressions (F.zip_with / F.aggregate), JVM-side.
(SURVEY.md north-star "similarity search"; embeddings table.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column | str) -> Column:
    v = F.col(vec) if isinstance(vec, str) else vec
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product — sequential fold in element order (deterministic)."""
    prods = F.zip_with(as_double(a), as_double(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column | str) -> Column:
    v = as_double(a)
    return F.sqrt(F.aggregate(F.transform(v, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def euclidean(a: Column | str, b: Column | str) -> Column:
    diffs = F.zip_with(as_double(a), as_double(b), lambda x, y: (x - y) * (x - y))
    return F.sqrt(F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x))


def hyperplane_sign_bits(vec: Column | str, n_planes: int, seed: int = 42) -> Column:
    """Random-hyperplane LSH signature as a BIGINT bit-pack.

    Plane components are deterministic pseudo-randoms derived from
    xxhash64(seed, plane, dim) — reproducible across runs/executors
    with no side data to ship. Sign of dot(vec, plane) → bit.
    """
    v = as_double(vec)
    bits = []
    for p in range(n_planes):
        # component_d = hash(seed,p,d) mapped to {-1,+1}: cheap Rademacher
        # planes (public SRP-LSH variant; Achlioptas-style sparse proj.)
        prods = F.zip_with(
            v,
            F.sequence(F.lit(0), F.size(v) - 1),
            lambda x, d: x
            * F.when(F.pmod(F.xxhash64(F.lit(seed), F.lit(p), d), F.lit(2)) == 0, 1.0).otherwise(
                -1.0
            ),
        )
        s = F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)
        bits.append(F.when(s >= 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long")) * (1 << p))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out
