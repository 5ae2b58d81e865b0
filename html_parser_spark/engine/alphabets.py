"""Custom alphabets + alphabetical-order validation (M14 in SURVEY.md §2.5).

Data transcribed from ``/root/reference/postProcessor/alphabets.ts:1-123``
(Lezgi and Tabasaran include digraphs — ГЪ ГЬ КЪ КЬ КI УЬ …  — which sort as
single letters).  The order check reimplements
``postProcessor/index.ts:46-87``: digraph prefix wins over single letter, a
spelling whose first letter(s) are not in the alphabet is an error, and an
entry whose alphabet index is below its predecessor's is an order violation.

The Spark version is the reference's only window-function-shaped operator:
``lag(collation_idx) OVER (ORDER BY seq)``.
"""

from __future__ import annotations

_RU = "АБВГДЕЁЖЗИЙКЛМНОПРСТУФХЦЧШЩЭЮЯ"
RUSSIAN_ALPHABET = list(_RU)

LEZGI_ALPHABET = [
    "А", "Б", "В", "Г", "ГЪ", "ГЬ", "Д", "Е", "Ё", "Ж", "З", "И", "Й",
    "К", "КЪ", "КЬ", "КI", "Л", "М", "Н", "О", "П", "ПI", "Р", "С",
    "Т", "ТI", "У", "УЬ", "Ф", "Х", "ХЪ", "ХЬ", "Ц", "ЦI", "Ч", "ЧI",
    "Ш", "Щ", "Э", "Ю", "Я",
]

TABASARAN_ALPHABET = (
    ["А", "АЬ"] + LEZGI_ALPHABET[1:]
)  # Tabasaran = Lezgi + АЬ after А (alphabets.ts:46-90)

ALPHABETS = {
    "lez": LEZGI_ALPHABET,
    "tab": TABASARAN_ALPHABET,
    "rus": RUSSIAN_ALPHABET,
}


def collation_index(spelling: str, alphabet: list[str]) -> tuple[str, int]:
    """postProcessor/index.ts:56-67 — (start_letter, alphabet index | -1);
    2-char digraph prefix wins over the single first letter."""
    if not spelling:
        return "", -1
    two = spelling[:2].upper()
    try:
        return spelling[:2], alphabet.index(two)
    except ValueError:
        one = spelling[0].upper()
        try:
            return spelling[0], alphabet.index(one)
        except ValueError:
            return spelling[0], -1


def check_alphabetical_order(spellings: list[str], alphabet: list[str]) -> list[dict]:
    """index.ts:46-87 — returns violation records instead of console lines:
    {seq, spelling, prev_spelling, reason: 'missing_letter'|'out_of_order'}."""
    errors = []
    prev_spelling = ""
    prev_idx = -1
    for i, spelling in enumerate(spellings):
        letter, idx = collation_index(spelling, alphabet)
        if idx == -1:
            errors.append(
                {
                    "seq": i,
                    "spelling": spelling,
                    "prev_spelling": prev_spelling,
                    "reason": "missing_letter",
                }
            )
        elif idx < prev_idx:
            errors.append(
                {
                    "seq": i,
                    "spelling": spelling,
                    "prev_spelling": prev_spelling,
                    "reason": "out_of_order",
                }
            )
        prev_spelling = spelling
        prev_idx = idx
    return errors
