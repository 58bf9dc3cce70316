"""Item fixer: canonicalize mojibake in ingested item names.

Reference: yupana-utils/.../OfdItemFixer.scala — OFD feeds arrive with
CP866-double-encoded guillemets and letters; the fixer is a small
replacement table applied before item names are tokenized/hashed.
Plug into ``Schema(item_fixer=ofd_item_fixer)`` to apply at ingest
(Warehouse.upsert canonicalizes hash-kind dimensions).
"""

from __future__ import annotations

_REPLACEMENTS = (
    ("┬л", '"'),
    ("┬╗", '"'),
    ("╕", "ё"),
    ("╣", "№"),
)


def ofd_item_fixer(s: str) -> str:
    if s is None:
        return None
    for broken, fixed in _REPLACEMENTS:
        s = s.replace(broken, fixed)
    return s
