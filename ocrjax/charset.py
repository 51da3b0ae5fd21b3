"""Charset: id <-> character mapping for CTC decoding.

Mirrors the reference's charset/dictionary file (SURVEY.md §2.1 R6: a file
mapping ids→chars loaded next to the recognizer weights). Conventions:

  * id 0 is the CTC blank (never appears in the file),
  * file format is one character per line (PaddleOCR-style dict),
  * a trailing space entry is supported via the literal line "<space>" or by
    `use_space=True`.
"""

from __future__ import annotations

import string
from typing import Iterable, List, Sequence

import numpy as np

_SPACE_TOKEN = "<space>"

# Default charset: digits, letters, common punctuation, space — a superset of
# what english-only OCR dictionaries ship. Deterministic order.
DEFAULT_CHARS = (
    string.digits
    + string.ascii_lowercase
    + string.ascii_uppercase
    + "!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~"
    + " "
)


class Charset:
    """Bidirectional char<->id map with CTC blank at id 0."""

    def __init__(self, chars: Iterable[str] = DEFAULT_CHARS):
        chars = list(chars)
        if len(set(chars)) != len(chars):
            dupes = sorted({c for c in chars if chars.count(c) > 1})
            raise ValueError(f"duplicate charset entries: {dupes!r}")
        self.chars: List[str] = chars
        # id 0 = blank; characters occupy ids 1..len(chars)
        self._char_to_id = {c: i + 1 for i, c in enumerate(chars)}

    # --- construction ------------------------------------------------------
    @classmethod
    def from_file(cls, path: str, use_space: bool = False) -> "Charset":
        chars: List[str] = []
        with open(path, "r", encoding="utf-8") as f:
            for line in f:
                line = line.rstrip("\n").rstrip("\r")
                if not line:
                    continue
                chars.append(" " if line == _SPACE_TOKEN else line)
        if use_space and " " not in chars:
            chars.append(" ")
        return cls(chars)

    def to_file(self, path: str) -> None:
        with open(path, "w", encoding="utf-8") as f:
            for c in self.chars:
                f.write((_SPACE_TOKEN if c == " " else c) + "\n")

    # --- sizes -------------------------------------------------------------
    @property
    def blank_id(self) -> int:
        return 0

    @property
    def num_classes(self) -> int:
        """Logit width: blank + characters."""
        return len(self.chars) + 1

    def __len__(self) -> int:
        return len(self.chars)

    def __contains__(self, c: str) -> bool:
        return c in self._char_to_id

    # --- encode / decode ---------------------------------------------------
    def encode(self, text: str) -> List[int]:
        """Text → ids. Raises KeyError on unmapped characters."""
        try:
            return [self._char_to_id[c] for c in text]
        except KeyError as e:
            raise KeyError(f"character {e.args[0]!r} not in charset") from None

    def encode_array(self, text: str, length: int, pad_id: int = 0) -> np.ndarray:
        """Fixed-length int32 id array, padded with `pad_id` (blank)."""
        ids = self.encode(text)[:length]
        out = np.full((length,), pad_id, dtype=np.int32)
        out[: len(ids)] = ids
        return out

    def decode(self, ids: Sequence[int]) -> str:
        """Ids → text. Blank (0) and padding (<=0 or > len) are skipped.

        This is a plain lookup — CTC collapse (dedup of repeats) happens
        on-device in ocrjax.ops.ctc before ids reach the host.
        """
        n = len(self.chars)
        return "".join(self.chars[i - 1] for i in ids if 1 <= i <= n)


def default_charset() -> Charset:
    return Charset(DEFAULT_CHARS)
