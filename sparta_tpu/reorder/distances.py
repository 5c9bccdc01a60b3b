"""Row-distance functions over column-block signatures.

Vectorized re-design of the reference's merge-scan distances
(blocking.cpp:720-994).  All four variants operate on popcounts of packed
block signatures:

  inter = |A ∩ B|,  aonly = |A \\ B|,  bonly = |B \\ A|   (in block domain)

========== ===================================== =============================
measure    count formula                          reference
========== ===================================== =============================
hamming     aonly*gB + bonly*gA                   HammingDistanceGroup
                                                  (count_zeros=1, :859-921)
jaccard     2*c / (|A|*gA + |B|*gB + c),          JaccardDistanceGroup
            c = hamming count                     (:923-994)
hamming_alt aonly*gA + bonly*gB                   HammingDistanceGroupOPENMP
                                                  (count_zeros=0, :720-787)
jaccard_alt as jaccard with hamming_alt count     JaccardDistanceGroupOPENMP
                                                  (:789-856)
========== ===================================== =============================

(The reference's "OPENMP" names are historical; they are alternate serial
implementations whose only semantic difference is the group-size weighting.)

Empty-row special cases follow the reference exactly: both empty -> 0;
one empty -> Hamming: max(elemsA*gA, elemsB*gB) using ELEMENT counts
(not block counts, blocking.cpp:865); Jaccard: 1.

With ``use_groups`` off (the default) gA == gB == 1 and the plain/_alt
variants coincide.
"""
from __future__ import annotations

import numpy as np

from ..definitions import SimMeasure


def pair_counts(pattern_bits: np.ndarray, rows_bits: np.ndarray):
    """(inter, aonly, bonly) of a single pattern vs a batch of rows.

    pattern_bits: [words] uint64;  rows_bits: [n, words] uint64.
    """
    inter = np.bitwise_count(rows_bits & pattern_bits).sum(axis=-1, dtype=np.int64)
    pop_a = int(np.bitwise_count(pattern_bits).sum())
    pop_b = np.bitwise_count(rows_bits).sum(axis=-1, dtype=np.int64)
    return inter, pop_a - inter, pop_b - inter, pop_a, pop_b


def distance_pattern_vs_rows(
    measure: SimMeasure | int,
    pattern_bits: np.ndarray,
    rows_bits: np.ndarray,
    group_size_a: int,
    elems_a: int,
    elems_b: np.ndarray,
    group_size_b: int = 1,
) -> np.ndarray:
    """Distance of one pattern (group size gA, element count elems_a) against
    a batch of candidate rows (element counts elems_b, gB=1).  float32 out,
    matching the reference's float return type."""
    measure = SimMeasure(measure)
    inter, aonly, bonly, pop_a, pop_b = pair_counts(pattern_bits, rows_bits)
    ga, gb = group_size_a, group_size_b

    if measure in (SimMeasure.hamming, SimMeasure.jaccard):
        count = aonly * gb + bonly * ga
    else:
        count = aonly * ga + bonly * gb

    if measure in (SimMeasure.hamming, SimMeasure.hamming_alt):
        dist = count.astype(np.float32)
        # empty-row special cases use ELEMENT counts (blocking.cpp:861-866)
        one_empty = (pop_a == 0) ^ (pop_b == 0)
        if pop_a == 0 or np.any(one_empty):
            fallback = np.maximum(elems_a * ga, elems_b * gb).astype(np.float32)
            dist = np.where(one_empty, fallback, dist)
        dist = np.where((pop_a == 0) & (pop_b == 0), np.float32(0), dist)
        return dist

    denom = pop_a * ga + pop_b * gb + count
    with np.errstate(divide="ignore", invalid="ignore"):
        dist = (2.0 * count / denom).astype(np.float32)
    one_empty = (pop_a == 0) ^ (pop_b == 0)
    dist = np.where(one_empty, np.float32(1), dist)
    dist = np.where((pop_a == 0) & (pop_b == 0), np.float32(0), dist)
    return dist


def distance_pair(
    measure: SimMeasure | int,
    bits_a: np.ndarray,
    bits_b: np.ndarray,
    group_size_a: int = 1,
    group_size_b: int = 1,
    elems_a: int = 0,
    elems_b: int = 0,
) -> float:
    """Scalar pair distance (reference TEST_similarities.cpp probe)."""
    d = distance_pattern_vs_rows(
        measure,
        bits_a,
        bits_b[None, :],
        group_size_a,
        elems_a,
        np.asarray([elems_b]),
        group_size_b,
    )
    return float(d[0])
