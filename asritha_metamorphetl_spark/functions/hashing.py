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

    The token array is LET-BOUND via a one-element array + transform:
    higher-order lambdas get no common-subexpression elimination, so
    referencing ``tokens(text)`` directly inside the per-shingle lambda
    would re-run the whole split+filter once per ``element_at`` — O(n²)
    per document (measured 17× slower on the sf0.1 corpus). Binding it
    as a lambda variable evaluates tokenization exactly once per row.
    """

    def shingles_of(toks: Column) -> Column:
        n = F.size(toks)
        # Short docs need an empty index array, but NOT via
        # when(n >= k, ...).otherwise(array()): a conditional generator
        # child knocks explode() consumers off the codegen path and the
        # interpreted fallback costs ~20× (measured on the sf0.1
        # corpus). sequence(1, 0) counts DOWN (default step -1), so
        # instead build sequence(1, max(stop, 1)) — always ascending —
        # and slice it to max(stop, 0) elements; slice(_, 1, 0) is the
        # empty array, branch-free.
        stop = n - (k - 1)
        idx = F.slice(
            F.sequence(F.lit(1), F.greatest(stop, F.lit(1))),
            1,
            F.greatest(stop, F.lit(0)),
        )
        return F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j) for j in range(k)]
            ),
        )

    return F.element_at(F.transform(F.array(tokens(text)), shingles_of), 1)


#: 2^61 − 1 (Mersenne prime) — modulus for the permutation family.
MERSENNE61 = (1 << 61) - 1
#: Permutation constants (a odd, < 2^12 so a·h < 2^60 never overflows a
#: signed 64-bit int; b arbitrary). Frozen — part of the operator contract.
_PERM_A = (769, 1031, 1543, 2053, 2311, 2777, 3079, 3331, 3583, 3847, 4001, 4093)
_PERM_B = (12, 777, 1432, 2099, 2641, 3310, 4093, 4721, 5432, 6011, 6733, 7039)

_HEX48_POWS = tuple(16 ** (11 - i) for i in range(12))


def _hex48(hex_col: Column) -> Column:
    """First 48 bits of a hex digest as a bigint, via pure arithmetic
    (strpos over nibbles) — identical in Spark and the SQL oracle, with no
    engine-specific hex-parse function."""
    out = F.lit(0).cast("long")
    for i, p in enumerate(_HEX48_POWS):
        nib = F.instr(F.lit(_HEX), F.substring(hex_col, i + 1, 1)) - 1
        out = out + nib.cast("long") * F.lit(p)
    return out


def hashed48(strings: Column) -> Column:
    """array<string> → array<bigint> 48-bit content hashes.

    Two nested transforms, NOT ``_hex48(md5(x))`` inlined: Spark does no
    common-subexpression elimination inside higher-order lambdas, so a
    single expression tree would re-run md5 once per nibble (12×). The
    inner transform binds each digest to a lambda variable; the outer one
    does pure arithmetic over it.
    """
    return F.transform(F.transform(strings, F.md5), _hex48)


def shingle_hash(s: Column) -> Column:
    """48-bit content hash of one shingle. For arrays use ``hashed48`` —
    this scalar form re-evaluates md5 per nibble if nested in a lambda."""
    return _hex48(F.md5(s))


def minhash_signature(hashes: Column, k: int = MINHASH_K) -> list[Column]:
    """K-row MinHash signature over PRE-HASHED shingles (see ``hashed48``):

        h_i(x) = (a_i · h(x) + b_i) mod (2^61 − 1)

    ``hashes`` must be a *materialized column*, not an inline expression:
    higher-order functions are interpreted (no codegen, no common-subexpr
    elimination), so an inline ``hashed48(...)`` here would recompute
    every md5 K times. Callers project the hash array first — Catalyst's
    CollapseProject keeps multi-referenced non-cheap aliases staged.
    Empty shingle sets yield NULL rows.
    """
    return [
        F.array_min(
            F.transform(
                hashes,
                lambda h: (F.lit(_PERM_A[i]) * h + F.lit(_PERM_B[i]))
                % F.lit(MERSENNE61),
            )
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


def token_hash_values(text: Column, bits: int = SIMHASH_BITS) -> Column:
    """Tokens → array of ``bits``-wide integer hashes (md5 once per token,
    nibble arithmetic). Stage this as its own column before
    ``simhash_from_values`` — see minhash_signature's CSE note."""
    toks = tokens(text)
    nibbles = bits // 4
    pows = tuple(16 ** (nibbles - 1 - i) for i in range(nibbles))

    def digest_value(digest: Column) -> Column:
        # digest is a bound lambda variable — md5 already evaluated once.
        v = F.lit(0).cast("long")
        for i, p in enumerate(pows):
            nib = F.instr(F.lit(_HEX), F.substring(digest, i + 1, 1)) - 1
            v = v + nib.cast("long") * F.lit(p)
        return v

    return F.transform(F.transform(toks, F.md5), digest_value)


def simhash_from_values(values: Column, bits: int = SIMHASH_BITS) -> Column:
    """SimHash from pre-hashed token values: per bit position, +1 per token
    whose hash bit is 1, −1 otherwise; output bit set where the sum is
    positive. Pure integer arithmetic — bit-identical across engines."""

    def bit_sum(j: int) -> Column:
        shift = 2 ** (bits - 1 - j)
        contrib = F.transform(values, lambda v: (F.floor(v / shift) % 2) * 2 - 1)
        return F.aggregate(contrib, F.lit(0).cast("long"), lambda acc, x: acc + x)

    out = F.lit(0).cast("long")
    for j in range(bits):
        out = out + F.when(bit_sum(j) > 0, F.lit(2 ** (bits - 1 - j))).otherwise(
            F.lit(0)
        )
    return out


def simhash(text: Column, bits: int = SIMHASH_BITS) -> Column:
    """One-shot SimHash column. Fine for small frames/tests; hot paths
    should stage token_hash_values as a column first (operators/dedup.py)."""
    return simhash_from_values(token_hash_values(text, bits), bits)
