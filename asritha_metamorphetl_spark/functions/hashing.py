"""Portable hashing primitives for dedup operators.

Everything here must be computable identically in Spark AND ANSI-ish SQL
(the DuckDB oracle), so hashes are built from md5 — available and
bit-identical in both engines — rather than engine-private functions
(xxhash64, DuckDB hash()). Performance note: md5 on short strings is
codegen'd JVM work; at 100 TB the cost is dwarfed by the shuffle these
operators feed, and the engine-internal fingerprint path
(quality/reconcile.py) keeps using xxhash64 where cross-engine parity
is not required.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from asritha_metamorphetl_spark.functions.text import tokens

#: MinHash geometry: K signature rows = BANDS × ROWS_PER_BAND.
MINHASH_K = 12
LSH_BANDS = 4
LSH_ROWS = 3
SHINGLE_SIZE = 3


def word_shingles(text: Column, k: int = SHINGLE_SIZE) -> Column:
    """Array of k-word shingles (contiguous token windows, space-joined).

    Docs shorter than k tokens produce an empty array.
    """
    toks = tokens(text)
    n = F.size(toks)
    # Guard: Spark's sequence(1, 0) counts DOWN (step defaults to -1), so
    # short docs must short-circuit to an empty array explicitly.
    idx = F.when(n >= k, F.sequence(F.lit(1), n - (k - 1))).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j) for j in range(k)]
        ),
    )


def minhash_signature(shingles: Column, k: int = MINHASH_K) -> list[Column]:
    """K-row MinHash signature using *string* min over salted md5 digests.

    min(md5(i || ':' || shingle)) is a valid min-hash per permutation i —
    lexicographic order over fixed-width hex is a total order — and is
    reproducible in any engine with md5. Empty shingle sets yield NULL rows.
    """
    return [
        F.array_min(
            F.transform(shingles, lambda s: F.md5(F.concat(F.lit(f"{i}:"), s)))
        ).alias(f"mh_{i}")
        for i in range(k)
    ]


def lsh_band_keys(
    signature_cols: list[Column],
    bands: int = LSH_BANDS,
    rows: int = LSH_ROWS,
) -> Column:
    """Array of band bucket keys: md5 over each band's signature rows.

    Two docs share a bucket key for band b iff their signatures agree on
    all of band b's rows — the standard LSH banding construction.
    """
    keys = []
    for b in range(bands):
        chunk = signature_cols[b * rows : (b + 1) * rows]
        keys.append(F.md5(F.concat_ws("|", F.lit(str(b)), *chunk)))
    return F.array(*keys)


#: SimHash width in bits (4 md5 hex nibbles). 16 bits keeps the SQL twin
#: readable; widen by taking more nibbles if finer granularity is needed.
SIMHASH_BITS = 16
_HEX = "0123456789abcdef"


def simhash(text: Column, bits: int = SIMHASH_BITS) -> Column:
    """Token-frequency SimHash over the first ``bits`` bits of md5(token).

    For each bit position: +1 per token whose hash bit is 1, −1 otherwise;
    the output bit is 1 where the sum is positive. Pure integer arithmetic
    → bit-identical across engines.
    """
    toks = tokens(text)

    def bit_sum(j: int) -> Column:
        nibble_pos = j // 4 + 1
        shift = 3 - (j % 4)
        contrib = F.transform(
            toks,
            lambda t: (
                F.floor(
                    (F.instr(F.lit(_HEX), F.substring(F.md5(t), nibble_pos, 1)) - 1)
                    / (2 ** shift)
                )
                % 2
            )
            * 2
            - 1,
        )
        return F.aggregate(contrib, F.lit(0).cast("long"), lambda acc, x: acc + x)

    out = F.lit(0).cast("long")
    for j in range(bits):
        out = out + F.when(bit_sum(j) > 0, F.lit(2 ** (bits - 1 - j))).otherwise(
            F.lit(0)
        )
    return out
