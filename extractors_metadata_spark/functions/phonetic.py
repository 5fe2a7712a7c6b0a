"""American Soundex phonetic encoding as a frozen pure-codegen kernel.

Engine-added capability: phonetic BLOCKING — the classical record-linkage /
fuzzy-vocabulary grouping key (NARA standard Soundex, the rule set published
with the 1880+ US census indexes). Complements ``typo_pairs`` (edit-distance
pairs) and ``stem_vocab`` (suffix conflation) in the fuzzy-matching family:
Soundex conflates by SOUND class, catching transliteration variants
(Ashcraft/Ashcroft, Tymczak/Tymzack) that neither edit-1 nor stemming blocks.

Algorithm (NARA rules, frozen):
1. strip to A-Z on the uppercased input (RE2-safe class, no backrefs);
2. delete H and W everywhere (consonants separated by h/w collapse — the
   Ashcraft rule), then map every remaining letter to its digit class
   (bfpv→1 cgjkqsxz→2 dt→3 l→4 mn→5 r→6 vowels→0) with ONE ``translate``
   whose to-string is 2 chars shorter than its from-string — both Spark and
   DuckDB delete unmapped trailing from-chars, which performs the h/w
   deletion and the digit mapping in a single pass;
3. collapse runs of equal digits with 5 chained ``replace(dd, d)`` passes per
   digit (run n -> ceil(n/2) per pass; complete for runs <= 32 — names are
   shorter). Vowel codes (0) break runs by sitting between them, exactly the
   published "separated by a vowel codes twice" rule;
4. if the first letter is NOT h/w, its code is position 1 of the collapsed
   string and is dropped (the first letter ships as a letter); if it IS h/w
   the coded string already starts at the second letter and nothing drops —
   the Wright (W623, r-code survives) vs Pfister (P236, duplicate f drops)
   distinction;
5. strip the 0s, pad with 0 to 3 digits, prepend the first letter.

Everything is upper/regexp_replace/translate/replace/substr/CASE — identical
builtins with identical semantics in Spark (JVM codegen) and DuckDB, so the
oracle replays the same chain verbatim; the published NARA test vectors
(Robert=R163, Ashcraft=A261, Tymczak=T522, Pfister=P236, Honeyman=H555) are
pinned in tests/test_phonetic.py. FROZEN: changing any table or pass count
changes blocking keys everywhere — treat like textnorm/urltools.

Reference analog: none — part of the engine's fuzzy/record-linkage widening.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# h/w LAST so the short to-string deletes them; everything else maps to its
# NARA digit class.
SOUNDEX_FROM = "ABCDEFGIJKLMNOPQRSTUVXYZHW"
SOUNDEX_TO = "012301202245501262301202"
_COLLAPSE_PASSES = 5  # complete for digit runs <= 32


def soundex(col: Column) -> Column:
    """NARA Soundex code (letter + 3 digits) of ``col``; NULL-safe via
    the empty-clean guard (non-alpha input -> '')."""
    clean = F.regexp_replace(F.upper(col), "[^A-Z]", "")
    first = F.substring(clean, 1, 1)
    coded = F.translate(clean, SOUNDEX_FROM, SOUNDEX_TO)
    collapsed = coded
    for _ in range(_COLLAPSE_PASSES):
        for d in "0123456":
            collapsed = F.replace(
                collapsed, F.lit(d + d), F.lit(d)
            )
    tail = F.when(
        first.isin("H", "W"), collapsed
    ).otherwise(F.substring(collapsed, 2, 2_000_000))
    digits = F.replace(tail, F.lit("0"), F.lit(""))
    return F.when(F.length(clean) == 0, F.lit("")).otherwise(
        F.concat(first, F.substring(F.concat(digits, F.lit("000")), 1, 3))
    )


def soundex_sql(expr: str) -> str:
    """The identical chain as DuckDB SQL over ``expr`` — generated from
    the same frozen tables so the two engines cannot drift."""
    clean = f"regexp_replace(upper({expr}), '[^A-Z]', '', 'g')"
    s = f"translate({clean}, '{SOUNDEX_FROM}', '{SOUNDEX_TO}')"
    for _ in range(_COLLAPSE_PASSES):
        for d in "0123456":
            s = f"replace({s}, '{d}{d}', '{d}')"
    first = f"substr({clean}, 1, 1)"
    tail = (
        f"CASE WHEN {first} IN ('H', 'W') THEN {s} "
        f"ELSE substr({s}, 2) END"
    )
    digits = f"replace({tail}, '0', '')"
    return (
        f"CASE WHEN length({clean}) = 0 THEN '' "
        f"ELSE {first} || substr({digits} || '000', 1, 3) END"
    )
