"""String-similarity scalar functions used by the pairwise scorer.

Reference analogs (SURVEY.md §2.8): Levenshtein name similarity
(claude_poc/entity-resolution_v4.py:588-603,
claude_poc_v2/vector_enhanced_entity_resolution_v2.py:1009-1031), Jaccard on
token sets (poc2:1250-1266), plus the Jaro-Winkler the north rule adds.
Pure-python scalar cores with numpy batch wrappers; names are short strings
so the per-pair cost is O(len^2) on tiny lengths. Batch wrappers memoize on
the (left, right) unique pairs of the batch.
"""

from __future__ import annotations

import numpy as np


def jaro(s1: str, s2: str) -> float:
    if s1 == s2:
        return 1.0
    n1, n2 = len(s1), len(s2)
    if n1 == 0 or n2 == 0:
        return 0.0
    match_dist = max(n1, n2) // 2 - 1
    f1 = [False] * n1
    f2 = [False] * n2
    matches = 0
    for i, c in enumerate(s1):
        lo = max(0, i - match_dist)
        hi = min(n2, i + match_dist + 1)
        for j in range(lo, hi):
            if not f2[j] and s2[j] == c:
                f1[i] = f2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    t = 0
    j = 0
    for i in range(n1):
        if f1[i]:
            while not f2[j]:
                j += 1
            if s1[i] != s2[j]:
                t += 1
            j += 1
    t //= 2
    return (matches / n1 + matches / n2 + (matches - t) / matches) / 3.0


def jaro_winkler(s1: str, s2: str, p: float = 0.1, max_prefix: int = 4) -> float:
    jw = jaro(s1, s2)
    if jw > 0.7:
        prefix = 0
        for a, b in zip(s1[:max_prefix], s2[:max_prefix]):
            if a == b:
                prefix += 1
            else:
                break
        jw += prefix * p * (1.0 - jw)
    return jw


def levenshtein(s1: str, s2: str) -> int:
    """Classic two-row DP edit distance."""
    if s1 == s2:
        return 0
    if len(s1) < len(s2):
        s1, s2 = s2, s1
    if not s2:
        return len(s1)
    prev = list(range(len(s2) + 1))
    for i, c1 in enumerate(s1):
        cur = [i + 1]
        for j, c2 in enumerate(s2):
            cur.append(min(prev[j + 1] + 1, cur[j] + 1, prev[j] + (c1 != c2)))
        prev = cur
    return prev[-1]


def damerau_levenshtein(s1: str, s2: str) -> int:
    """FULL Damerau-Levenshtein (Lowrance-Wagner 1975: unrestricted
    transpositions via the per-character last-occurrence table) — NOT the
    optimal-string-alignment restriction: dl("CA","ABC") == 2, where OSA
    gives 3. Matches DuckDB's damerau_levenshtein(), so SNM joins built
    on it are SQL-checkable."""
    if s1 == s2:
        return 0
    la, lb = len(s1), len(s2)
    if not la:
        return lb
    if not lb:
        return la
    maxd = la + lb
    da: dict[str, int] = {}
    # (la+2) x (lb+2) DP with the -1/0 border rows of Lowrance-Wagner
    d = [[0] * (lb + 2) for _ in range(la + 2)]
    d[0][0] = maxd
    for i in range(la + 1):
        d[i + 1][0] = maxd
        d[i + 1][1] = i
    for j in range(lb + 1):
        d[0][j + 1] = maxd
        d[1][j + 1] = j
    for i in range(1, la + 1):
        db = 0
        for j in range(1, lb + 1):
            k = da.get(s2[j - 1], 0)
            l = db
            if s1[i - 1] == s2[j - 1]:
                cost = 0
                db = j
            else:
                cost = 1
            d[i + 1][j + 1] = min(
                d[i][j] + cost,               # substitution
                d[i + 1][j] + 1,              # insertion
                d[i][j + 1] + 1,              # deletion
                d[k][l] + (i - k - 1) + 1 + (j - l - 1),  # transposition
            )
        da[s1[i - 1]] = i
    return d[la + 1][lb + 1]


def levenshtein_ratio(s1: str, s2: str) -> float:
    """1 - d/maxlen, the reference's name similarity (poc1:588-603)."""
    if not s1 and not s2:
        return 1.0
    m = max(len(s1), len(s2))
    return 1.0 - levenshtein(s1, s2) / m


def token_set_levenshtein(s1: str, s2: str) -> float:
    """Order-insensitive name similarity: sort tokens, then ratio.

    Handles "Last, First" vs "First Last" without the reference's explicit
    reorder rule (poc2:1033-1051) while matching its intent.
    """
    t1 = " ".join(sorted(s1.split()))
    t2 = " ".join(sorted(s2.split()))
    return levenshtein_ratio(t1, t2)


def jaccard_tokens(s1: str, s2: str) -> float:
    a, b = set(s1.split()), set(s2.split())
    if not a and not b:
        return 1.0
    u = len(a | b)
    return len(a & b) / u if u else 1.0


def year_compatibility(y1: float, y2: float) -> float:
    """Temporal similarity rule (simplified from poc2:803-915's rule table):
    1.0 same year, decaying to 0 at >=25 years apart; 0.5 when either side
    is unknown (NaN) — unknown is compatible-but-uninformative."""
    if np.isnan(y1) or np.isnan(y2):
        return 0.5
    d = abs(y1 - y2)
    if d == 0:
        return 1.0
    return max(0.0, 1.0 - d / 25.0)


def _pairwise_batch(fn, left: np.ndarray, right: np.ndarray) -> np.ndarray:
    """Apply a scalar pair fn over two object arrays, memoizing unique pairs."""
    n = len(left)
    out = np.empty(n, dtype=np.float64)
    cache: dict[tuple, float] = {}
    for i in range(n):
        key = (left[i], right[i])
        v = cache.get(key)
        if v is None:
            v = fn(left[i], right[i])
            cache[key] = v
        out[i] = v
    return out


def jaro_winkler_batch(left, right) -> np.ndarray:
    return _pairwise_batch(jaro_winkler, np.asarray(left, object), np.asarray(right, object))


def token_set_levenshtein_batch(left, right) -> np.ndarray:
    return _pairwise_batch(token_set_levenshtein, np.asarray(left, object), np.asarray(right, object))


def damerau_levenshtein_batch(left, right) -> np.ndarray:
    return _pairwise_batch(
        damerau_levenshtein, np.asarray(left, object), np.asarray(right, object)
    )


def jaccard_tokens_batch(left, right) -> np.ndarray:
    return _pairwise_batch(jaccard_tokens, np.asarray(left, object), np.asarray(right, object))


def year_compat_batch(left, right) -> np.ndarray:
    l = np.asarray(left, dtype=np.float64)
    r = np.asarray(right, dtype=np.float64)
    out = np.full(len(l), 0.5)
    known = ~(np.isnan(l) | np.isnan(r))
    d = np.abs(l[known] - r[known])
    out[known] = np.maximum(0.0, 1.0 - d / 25.0)
    return out


# ---------------------------------------------------------------------------
# Soundex phonetic code (simplified American Soundex, RE2-expressible)

_SOUNDEX_MAP = str.maketrans(
    {
        **{c: "1" for c in "BFPV"},
        **{c: "2" for c in "CGJKQSXZ"},
        **{c: "3" for c in "DT"},
        "L": "4",
        **{c: "5" for c in "MN"},
        "R": "6",
        **{c: "0" for c in "AEIOUYHW"},
    }
)


def soundex(name: str) -> str:
    """Phonetic code of the first-letter + 3-digit Soundex family — the
    classic phonetic blocking key for dirty person names (Russell 1918;
    simplified variant WITHOUT the H/W-adjacency rule so the exact same
    algorithm is expressible as an RE2 regexp_replace chain in a SQL
    oracle; H/W map to 0 like vowels). Empty/non-alphabetic input -> ''.

    Spec (shared verbatim with the oracle): uppercase, strip non-letters,
    map every letter to its digit class (vowels/H/W/Y -> 0), collapse
    adjacent equal digits, remove zeros, drop the leading digit when the
    first LETTER itself mapped to a nonzero digit (its run merged into
    it), then first letter + first 3 remaining digits padded with 0."""
    letters = [c for c in name.upper() if "A" <= c <= "Z"]
    if not letters:
        return ""
    u = "".join(letters)
    mapped = u.translate(_SOUNDEX_MAP)
    collapsed = []
    for ch in mapped:
        if not collapsed or collapsed[-1] != ch:
            collapsed.append(ch)
    digits = "".join(c for c in collapsed if c != "0")
    if mapped[0] != "0":
        digits = digits[1:]
    return u[0] + (digits + "000")[:3]


def soundex_batch(names) -> list[str]:
    memo: dict[str, str] = {}
    out = []
    for n in names:
        s = "" if n is None else str(n)
        got = memo.get(s)
        if got is None:
            got = memo[s] = soundex(s)
        out.append(got)
    return out
