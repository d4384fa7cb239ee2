"""Pure-Python reference implementation of the PUBLISHED Snowball
Russian stemming algorithm (snowballstem.org/algorithms/russian/stemmer.html)
— the dictionary-grade stemmer behind PostgreSQL's
``to_tsvector('russian', ...)`` (`iis_etl/logic.py:394-404` in the
reference system). Used ONLY as the parity yardstick in
tests/test_text.py: the production path stays the engine-portable
regex light stemmer (functions/text.RU_STEM_PATTERN), whose divergence
from this algorithm is measured and documented, not hidden.

Implemented from the public algorithm description: RV/R2 regions,
perfective gerund → reflexive → adjectival/verb/noun passes, the и
removal, derivational -ость in R2, and the superlative / double-н /
soft-sign tidy-up.
"""

from __future__ import annotations

VOWELS = "аеиоуыэюя"

PERFECTIVE_GERUND_1 = ("вшись", "вши", "в")  # must follow а/я
PERFECTIVE_GERUND_2 = ("ившись", "ывшись", "ивши", "ывши", "ив", "ыв")
REFLEXIVE = ("ся", "сь")
ADJECTIVE = (
    "ими", "ыми", "его", "ого", "ему", "ому",
    "ее", "ие", "ые", "ое", "ей", "ий", "ый", "ой", "ем", "им", "ым",
    "ом", "их", "ых", "ую", "юю", "ая", "яя", "ою", "ею",
)
PARTICIPLE_1 = ("ем", "нн", "вш", "ющ", "щ")  # must follow а/я
PARTICIPLE_2 = ("ивш", "ывш", "ующ")
VERB_1 = (
    "ете", "йте", "ешь", "нно", "ла", "на", "ли", "ем", "ло", "но",
    "ет", "ют", "ны", "ть", "й", "л", "н",
)  # must follow а/я
VERB_2 = (
    "ейте", "уйте", "ила", "ыла", "ена", "ите", "или", "ыли", "ило",
    "ыло", "ено", "ует", "уют", "ены", "ить", "ыть", "ишь", "ей", "уй",
    "ил", "ыл", "им", "ым", "ен", "ят", "ит", "ыт", "ую", "ю",
)
NOUN = (
    "иями", "ями", "ами", "иям", "ием", "иях", "ией",
    "ям", "ем", "ам", "ом", "ах", "ях", "ию", "ью", "ия", "ья",
    "ев", "ов", "ие", "ье", "еи", "ии", "ей", "ой", "ий",
    "а", "е", "и", "й", "о", "у", "ы", "ь", "ю", "я",
)
SUPERLATIVE = ("ейше", "ейш")
DERIVATIONAL = ("ость", "ост")


def _rv_r2(word: str) -> tuple[int, int]:
    """Start offsets of RV (after first vowel) and R2 (standard Snowball
    R1-of-R1)."""
    rv = len(word)
    for i, ch in enumerate(word):
        if ch in VOWELS:
            rv = i + 1
            break
    # R1: after the first non-vowel following a vowel
    r1 = len(word)
    for i in range(1, len(word)):
        if word[i] not in VOWELS and word[i - 1] in VOWELS:
            r1 = i + 1
            break
    r2 = len(word)
    for i in range(r1 + 1, len(word)):
        if word[i] not in VOWELS and word[i - 1] in VOWELS:
            r2 = i + 1
            break
    return rv, r2


def _strip(word: str, rv: int, endings, preceded_by_a_ya: bool = False):
    """Longest matching ending that lies entirely in RV; for group-1
    endings the char BEFORE the ending must be а/я (and stays)."""
    for e in sorted(endings, key=len, reverse=True):
        if not word.endswith(e):
            continue
        start = len(word) - len(e)
        if start < rv:
            continue
        if preceded_by_a_ya:
            if start == 0 or word[start - 1] not in "ая":
                continue
        return word[:start]
    return None


def snowball_ru(word: str) -> str:
    """Stem one lowercase Russian word per the published algorithm."""
    word = word.replace("ё", "е")
    rv, r2 = _rv_r2(word)

    # Step 1: perfective gerund, else (reflexive?) adjectival/verb/noun
    w = _strip(word, rv, PERFECTIVE_GERUND_2) or _strip(
        word, rv, PERFECTIVE_GERUND_1, preceded_by_a_ya=True
    )
    if w is None:
        w = _strip(word, rv, REFLEXIVE) or word
        adj = _strip(w, rv, ADJECTIVE)
        if adj is not None:
            w = adj
            part = _strip(w, rv, PARTICIPLE_2) or _strip(
                w, rv, PARTICIPLE_1, preceded_by_a_ya=True
            )
            if part is not None:
                w = part
        else:
            v = _strip(w, rv, VERB_2) or _strip(
                w, rv, VERB_1, preceded_by_a_ya=True
            )
            if v is not None:
                w = v
            else:
                n = _strip(w, rv, NOUN)
                if n is not None:
                    w = n
    else:
        pass  # perfective gerund removed — step 1 done
        word = w
        w = word

    # Step 2: и
    if w.endswith("и") and len(w) - 1 >= rv:
        w = w[:-1]

    # Step 3: derivational (in R2)
    for e in DERIVATIONAL:
        if w.endswith(e) and len(w) - len(e) >= r2:
            w = w[: len(w) - len(e)]
            break

    # Step 4
    if w.endswith("нн"):
        w = w[:-1]
    else:
        sup = _strip(w, rv, SUPERLATIVE)
        if sup is not None:
            w = sup
            if w.endswith("нн"):
                w = w[:-1]
        elif w.endswith("ь") and len(w) - 1 >= rv:
            w = w[:-1]
    return w
