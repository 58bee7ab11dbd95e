"""Portable expression templates: one semantic definition, two SQL dialects.

The training-data operators (dedup fingerprints, MinHash, SimHash, cosine
similarity, text stats) are hash/fold-heavy. To give every one of them an EXACT
DuckDB oracle — not a rows-only check — each is defined once as a template
rendered into (a) Spark SQL for ``F.expr`` and (b) DuckDB SQL for the oracle.
Both dialects then execute the *same arithmetic in the same order*, so results
match bit-for-bit (integer folds) or IEEE-identically (double folds).

The workhorse is a portable polynomial string hash
    H(s) = fold_{i=1..len(s)} (acc*31 + ascii(s[i])) mod 2147483647
— expressible as a left fold in both engines, stable across platforms (unlike
murmur3/xxhash whose implementations differ between Spark and DuckDB).
"""

from __future__ import annotations

from dataclasses import dataclass

MOD = 2_147_483_647  # 2^31 - 1 (prime), keeps 31-bit values: products fit in int64


@dataclass(frozen=True)
class Dialect:
    name: str

    # ---- list/array primitives ------------------------------------------------
    def alen(self, arr: str) -> str:
        return f"size({arr})" if self.name == "spark" else f"len({arr})"

    def afilter(self, arr: str, lam: str) -> str:
        fn = "filter" if self.name == "spark" else "list_filter"
        return f"{fn}({arr}, {lam})"

    def amap(self, arr: str, lam: str) -> str:
        fn = "transform" if self.name == "spark" else "list_transform"
        return f"{fn}({arr}, {lam})"

    def amin(self, arr: str) -> str:
        fn = "array_min" if self.name == "spark" else "list_min"
        return f"{fn}({arr})"

    def adistinct(self, arr: str) -> str:
        fn = "array_distinct" if self.name == "spark" else "list_distinct"
        return f"{fn}({arr})"

    def aintersect(self, a: str, b: str) -> str:
        fn = "array_intersect" if self.name == "spark" else "list_intersect"
        return f"{fn}({a}, {b})"

    def fold(self, arr: str, init: str, lam: str) -> str:
        """Left fold with explicit init. Spark: aggregate(); DuckDB: list_reduce
        over the init-prepended list (same evaluation order)."""
        if self.name == "spark":
            return f"aggregate({arr}, {init}, {lam})"
        return f"list_reduce(list_prepend({init}, {arr}), {lam})"

    def seq1(self, n: str) -> str:
        """[1..n] as a list (n >= 1)."""
        if self.name == "spark":
            return f"sequence(1, {n})"
        return f"range(1, ({n}) + 1)"

    def elem(self, arr: str, i: str) -> str:
        return f"element_at({arr}, {i})" if self.name == "spark" else f"({arr})[{i}]"

    def intdiv(self, a: str, b: str) -> str:
        return f"({a} div {b})" if self.name == "spark" else f"({a} // {b})"

    def bxor(self, a: str, b: str) -> str:
        """Bitwise xor of two integer expressions."""
        return f"({a} ^ {b})" if self.name == "spark" else f"xor({a}, {b})"

    def bitcount(self, x: str) -> str:
        """Population count of an integer expression (both engines ship it)."""
        return f"bit_count({x})"

    def trunc6(self, x: str) -> str:
        """Truncate a double to 6 decimals via floor — unlike round(), floor
        semantics are identical in Spark and DuckDB (round differs on ties)."""
        return f"(floor(({x}) * 1000000) / 1000000)"

    def regex_replace_all(self, s: str, pat: str, rep: str) -> str:
        if self.name == "spark":
            return f"regexp_replace({s}, '{pat}', '{rep}')"
        return f"regexp_replace({s}, '{pat}', '{rep}', 'g')"  # duckdb default: first only

    def regex_extract_all_count(self, s: str, pat: str) -> str:
        if self.name == "spark":
            return f"size(regexp_extract_all({s}, '{pat}', 0))"
        return f"len(regexp_extract_all({s}, '{pat}'))"

    # ---- composite templates --------------------------------------------------
    def tokens(self, text: str) -> str:
        """Whitespace tokens with empties dropped."""
        if self.name == "spark":
            split = f"split({text}, ' ')"
        else:
            split = f"string_split({text}, ' ')"
        return self.afilter(split, "x -> x <> ''")

    def shingles(self, text: str, k: int) -> str:
        """Distinct character k-grams (n_chars >= k assumed; guard upstream)."""
        grams = self.amap(self.seq1(f"length({text}) - {k - 1}"),
                          f"i -> substring({text}, i, {k})")
        return self.adistinct(grams)

    def poly_hash_str(self, s: str) -> str:
        """H(s): portable 31-bit polynomial hash of a string expression."""
        codes = self.amap(self.seq1(f"length({s})"),
                          f"i -> CAST(ascii(substring({s}, i, 1)) AS BIGINT)")
        return self.fold(codes, "CAST(0 AS BIGINT)",
                         f"(acc, c) -> (acc * 31 + c) % {MOD}")

    def token_hashes(self, text: str) -> str:
        """Distinct token hash list (basis for MinHash/SimHash)."""
        return self.adistinct(self.amap(self.tokens(text),
                                        f"t -> {self.poly_hash_str('t')}"))

    def sum_double(self, arr: str) -> str:
        return self.fold(arr, "CAST(0.0 AS DOUBLE)", "(acc, x) -> acc + x")

    def dot(self, a: str, b: str) -> str:
        """Index-order dot product of two float vectors, accumulated in double
        (identical op order in both engines -> bitwise-equal results)."""
        prods = self.amap(
            self.seq1(self.alen(a)),
            f"i -> CAST({self.elem(a, 'i')} AS DOUBLE) * "
            f"CAST({self.elem(b, 'i')} AS DOUBLE)",
        )
        return self.sum_double(prods)

    def cosine(self, a: str, b: str) -> str:
        # nullif guard: a zero-norm vector makes the denominator 0.0, which
        # ANSI-mode Spark raises on (DIVIDE_BY_ZERO) and IEEE would NaN —
        # both engines instead yield NULL, which DESC ordering puts LAST in
        # Spark and DuckDB alike ("undefined similarity is never a top hit")
        return (f"({self.dot(a, b)}) / "
                f"nullif(sqrt({self.dot(a, a)}) * sqrt({self.dot(b, b)})"
                f", CAST(0.0 AS DOUBLE))")

    def minhash_term(self, hashes: str, a: int, b: int) -> str:
        """min over tokens of (a*H + b) mod p — one permutation."""
        return self.amin(self.amap(hashes, f"h -> (h * {a} + {b}) % {MOD}"))

    def simhash32(self, hashes: str) -> str:
        """32-bit SimHash over distinct token hashes: bit b set iff more token
        hashes have bit b set than clear (unweighted variant). Each bit's vote
        is a fold-sum (no per-bit array allocation — the filter-then-length
        form materializes 32 temporary arrays per row). ``hashes`` should be a
        COLUMN reference, not an inline expression: it is referenced ~64x."""
        terms = []
        for b in range(32):
            cnt = self.fold(
                hashes, "CAST(0 AS BIGINT)",
                f"(acc, h) -> acc + {self.intdiv('h', str(1 << b))} % 2",
            )
            terms.append(
                f"(CASE WHEN 2 * ({cnt}) > {self.alen(hashes)} "
                f"THEN CAST({1 << b} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
            )
        return "(" + " + ".join(terms) + ")"


SPARK = Dialect("spark")
DUCK = Dialect("duck")
