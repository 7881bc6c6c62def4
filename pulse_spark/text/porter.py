"""Classic Porter stemmer (Porter, 1980), pure Python.

Implements the original algorithm exactly as the ANSI-C reference
implementation (porter.c, tartarus.org) does, including its two marked
DEPARTURES from the published paper (step2 ``bli -> ble`` instead of
``abli -> able``, and the added ``logi -> log`` rule).  The reference
engine stems with go-porterstemmer (``pkg/word/word.go:46-57``), which is
a faithful port of the same C code, so byte-for-byte token parity with the
reference requires these exact semantics — NOT Porter2/Snowball-English.

Vectorization note: stemming is called per *distinct* token with an LRU
dict cache (see ``stem_tokens``); inside Arrow pandas UDFs this keeps the
per-row Python cost amortized to near zero on Zipfian text.
"""

from __future__ import annotations

__all__ = ["stem", "stem_tokens"]


def _is_cons(word: str, i: int) -> bool:
    c = word[i]
    if c in "aeiou":
        return False
    if c == "y":
        return True if i == 0 else not _is_cons(word, i - 1)
    return True


def _measure(word: str, j: int) -> int:
    """Number of VC sequences in word[0:j+1] (the 'm' of the paper)."""
    n = 0
    i = 0
    # skip initial consonants
    while True:
        if i > j:
            return n
        if not _is_cons(word, i):
            break
        i += 1
    i += 1
    while True:
        # inside a vowel run
        while True:
            if i > j:
                return n
            if _is_cons(word, i):
                break
            i += 1
        i += 1
        n += 1
        # inside a consonant run
        while True:
            if i > j:
                return n
            if not _is_cons(word, i):
                break
            i += 1
        i += 1


def _vowel_in_stem(word: str, j: int) -> bool:
    return any(not _is_cons(word, i) for i in range(j + 1))


def _double_cons(word: str, j: int) -> bool:
    if j < 1:
        return False
    if word[j] != word[j - 1]:
        return False
    return _is_cons(word, j)


def _cvc(word: str, i: int) -> bool:
    """cons-vowel-cons ending at i, where the final cons is not w/x/y."""
    if i < 2 or not _is_cons(word, i) or _is_cons(word, i - 1) or not _is_cons(word, i - 2):
        return False
    return word[i] not in "wxy"


def _ends(word: str, k: int, suffix: str) -> int | None:
    """Return j (stem end index) if word[:k+1] ends with suffix, else None."""
    ln = len(suffix)
    if ln > k + 1:
        return None
    if word[k - ln + 1 : k + 1] == suffix:
        return k - ln
    return None


def stem(w: str) -> str:
    """Stem a single lowercase word. Non-alphabetic input passes through
    the same code path the reference uses (it stems every token)."""
    if len(w) <= 2:
        return w

    word = w
    k = len(word) - 1

    # ---- step 1a
    if word[k] == "s":
        if _ends(word, k, "sses") is not None:
            k -= 2
        elif _ends(word, k, "ies") is not None:
            word = word[: k - 2] + "i"
            k -= 2
        elif word[k - 1] != "s":
            k -= 1

    # ---- step 1b
    j = _ends(word, k, "eed")
    if j is not None:
        if _measure(word, j) > 0:
            k -= 1
    else:
        j = _ends(word, k, "ed")
        if j is None:
            j = _ends(word, k, "ing")
        if j is not None and _vowel_in_stem(word, j):
            k = j
            if _ends(word, k, "at") is not None:
                word = word[: k + 1] + "e"
                k += 1
            elif _ends(word, k, "bl") is not None:
                word = word[: k + 1] + "e"
                k += 1
            elif _ends(word, k, "iz") is not None:
                word = word[: k + 1] + "e"
                k += 1
            elif _double_cons(word, k):
                if word[k] not in "lsz":
                    k -= 1
            elif _measure(word, k) == 1 and _cvc(word, k):
                word = word[: k + 1] + "e"
                k += 1

    # ---- step 1c
    if word[k] == "y" and _vowel_in_stem(word, k - 1):
        word = word[:k] + "i" + word[k + 1 :]

    # ---- step 2 (m > 0 rules keyed on penultimate letter, as porter.c)
    step2 = (
        ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
        ("izer", "ize"), ("bli", "ble"),  # DEPARTURE (paper: abli->able)
        ("alli", "al"), ("entli", "ent"), ("eli", "e"), ("ousli", "ous"),
        ("ization", "ize"), ("ation", "ate"), ("ator", "ate"), ("alism", "al"),
        ("iveness", "ive"), ("fulness", "ful"), ("ousness", "ous"),
        ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
        ("logi", "log"),  # DEPARTURE (added rule)
    )
    for suf, rep in step2:
        j = _ends(word, k, suf)
        if j is not None:
            if _measure(word, j) > 0:
                word = word[: j + 1] + rep + word[k + 1 :]
                k = j + len(rep)
            break

    # ---- step 3
    step3 = (
        ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
        ("ical", "ic"), ("ful", ""), ("ness", ""),
    )
    for suf, rep in step3:
        j = _ends(word, k, suf)
        if j is not None:
            if _measure(word, j) > 0:
                word = word[: j + 1] + rep + word[k + 1 :]
                k = j + len(rep)
            break

    # ---- step 4 (m > 1: drop suffix)
    step4 = (
        "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
        "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
    )
    for suf in step4:
        j = _ends(word, k, suf)
        if j is not None:
            if suf == "ion" and (j < 0 or word[j] not in "st"):
                break
            if _measure(word, j) > 1:
                k = j
            break

    # ---- step 5a
    if word[k] == "e":
        a = _measure(word, k)
        if a > 1 or (a == 1 and not _cvc(word, k - 1)):
            k -= 1

    # ---- step 5b
    if word[k] == "l" and _double_cons(word, k) and _measure(word, k) > 1:
        k -= 1

    return word[: k + 1]


_CACHE: dict[str, str] = {}
_CACHE_MAX = 1 << 20


def stem_tokens(tokens: list[str]) -> list[str]:
    """Stem a token list with a module-level memo (Zipf-friendly)."""
    out = []
    for t in tokens:
        s = _CACHE.get(t)
        if s is None:
            s = stem(t)
            if len(_CACHE) < _CACHE_MAX:
                _CACHE[t] = s
        out.append(s)
    return out
