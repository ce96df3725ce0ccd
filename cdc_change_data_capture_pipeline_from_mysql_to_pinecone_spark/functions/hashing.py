"""Portable hashing primitives (JVM-side, no Python UDFs).

Dedup/fingerprint operators need 64-bit hashes that an external SQL
oracle can reproduce exactly. Spark's ``xxhash64``/``hash`` are not
portable across engines, so the engine defines::

    portable_hash64(x) = int(md5(x)[0:15], 16)      # 60 bits, fits i64

which any engine with ``md5`` can compute (DuckDB:
``('0x' || substr(md5(x),1,15))::BIGINT``). md5 here is a content
fingerprint, not a security primitive. All expressions below stay
inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def portable_hash64(col: Column) -> Column:
    """64-bit (60 usable bits) deterministic, engine-portable hash."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def seeded_hash64(col: Column, seed: int) -> Column:
    """Independent hash family member: hash of the value salted with
    the seed. One full md5 per (value, seed) — prefer the universal
    family below when k hashes of the same value are needed."""
    return portable_hash64(F.concat(col, F.lit(f"#seed{seed}")))


#: Mersenne prime 2^31-1: keeps a*h+b < 2^63 so Spark (wrapping Java
#: long) and strict-overflow engines (DuckDB BIGINT) compute identical
#: values.
MERSENNE31 = 2_147_483_647


def universal_coeffs(k: int) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) pairs for the universal hash family
    h_i(x) = (a_i * x + b_i) mod MERSENNE31, derived from md5 so any
    engine/driver can regenerate them."""
    import hashlib

    out = []
    for i in range(k):
        a = int(hashlib.md5(f"uh-a{i}".encode()).hexdigest()[:15], 16) % (MERSENNE31 - 1) + 1
        b = int(hashlib.md5(f"uh-b{i}".encode()).hexdigest()[:15], 16) % MERSENNE31
        out.append((a, b))
    return out


def base_hash31(col: Column) -> Column:
    """Content hash reduced into the Mersenne field — the single md5
    evaluation the universal family members derive from."""
    return portable_hash64(col) % MERSENNE31


#: Prime multiplier for the token-polynomial shingle hash. Bounds:
#: every intermediate is (< MERSENNE31) * SHINGLE_P + (< MERSENNE31)
#: ~ 2^51 — exact in Java longs and DuckDB BIGINTs alike.
SHINGLE_P = 1_000_003


def token_hashes(text_col: Column) -> Column:
    """Array of per-TOKEN base hashes (whitespace tokenization, one
    md5 per token, reduced into the Mersenne field). The input to
    :func:`poly_shingle_expr`: hashing tokens once and combining
    n-grams arithmetically md5-hashes each byte of text exactly once,
    where hashing shingle STRINGS (the pre-r6 formulation) md5-hashes
    every byte n times AND builds n-gram strings first — measured 3.4x
    slower at the 50k-doc scale. NULL text yields NULL (callers drop
    it); empty text hashes the single empty token, matching the old
    concat_ws behavior."""
    toks = F.split(F.trim(text_col), r"\s+")
    return F.transform(toks, lambda t: base_hash31(t))


def poly_shingle_expr(n: int = 3, arr: str = "_th") -> str:
    """SQL expression (over a materialized token-hash array attribute
    ``arr``) for the word n-gram shingle hashes::

        shingle_i = fold_{j=0..n-1} (acc * SHINGLE_P + th[i+j]) % M31

    Documents with fewer than ``n`` tokens fold their whole array as
    the one shingle (the word_shingles short-doc rule). The attribute
    MUST be materialized through a Generate barrier first (explode of
    a one-element array) — inlined, CollapseProject would re-evaluate
    the per-token md5 chain once per subscript. DuckDB mirror:
    ``_duck_token_poly_base`` in the entry module — the formula is the
    cross-engine contract."""
    def unroll(idx: str, k: int) -> str:
        acc = "0"
        for j in range(k):
            acc = f"(({acc} * {SHINGLE_P} + element_at({arr}, {idx} + {j})) % {MERSENNE31})"
        return acc

    return (
        f"CASE WHEN size({arr}) < {n} THEN "
        f"array(aggregate({arr}, 0L, (acc, h) -> (acc * {SHINGLE_P} + h) % {MERSENNE31})) "
        f"ELSE transform(sequence(1, size({arr}) - {n - 1}), i -> {unroll('i', n)}) END"
    )


def universal_hash(base: Column, a: int, b: int) -> Column:
    """h_i over a precomputed base_hash31 value: one multiply-add,
    no additional md5."""
    return (F.lit(a) * base + F.lit(b)) % MERSENNE31


def word_shingles(text: Column, n: int = 3) -> Column:
    """Array of word ``n``-gram shingles of ``text``.

    Whitespace-tokenizes, then slides a window of ``n`` tokens. A text
    with fewer than ``n`` tokens yields its full token join as the one
    shingle (so short docs still participate in dedup).

    ``n=1`` short-circuits to the token array itself (r15): the
    generic window construction degenerates to
    ``concat_ws(" ", slice(toks, i, 1))`` — one array allocation and
    one string copy PER TOKEN just to rebuild each token verbatim.
    The values are identical by construction (a 1-window's join IS
    the token; the k<n branch can only fire for k=0, which the
    whitespace split never produces — empty text tokenizes to [""],
    NULL stays NULL on both forms). ANSI dependency (ADVICE r15): the
    NULL-equivalence claim assumes ``size(NULL) = NULL`` — Spark 4's
    ANSI default, and what every session in this repo runs. Under
    ``spark.sql.ansi.enabled=false`` legacy ``size(NULL) = -1`` fires
    the generic form's k<n branch, which returns [""] for NULL text
    where this short-circuit returns NULL; the short-circuit's NULL is
    the documented operator behavior either way.

    For n >= 2 the windows build as a ZIP-WITH CHAIN over n shifted
    slices (r16) instead of a per-position ``slice`` + ``concat_ws``:
    the old ``transform(sequence(1, k-n+1), i -> concat_ws(" ",
    slice(toks, i, n)))`` allocated a fresh n-element array PER WINDOW
    POSITION in interpreted HOF eval — measured as the dominant cost
    of every shingle-exploding query at sf10 (the bigram explode alone:
    23.5 -> 2.8 s, 8x, identical values). The chain allocates n slices
    plus n-2 intermediates per ROW, and each element op is a plain
    string concat. Values are identical by construction: window i is
    tok_i .. tok_{i+n-1} joined by single spaces either way (split
    never yields NULL tokens, so concat == concat_ws)."""
    toks = F.split(F.trim(text), r"\s+")
    if n == 1:
        return toks
    k = F.size(toks)
    full = F.array(F.concat_ws(" ", toks))
    m = k - n + 1  # window count; >= 1 wherever the otherwise branch runs
    windows = F.slice(toks, 1, m)
    for j in range(1, n):
        windows = F.zip_with(
            windows,
            F.slice(toks, 1 + j, m),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    return F.when(k < n, full).otherwise(windows)
