"""Text normalizers for transcription output comparison.

Rebuild of the vendored Whisper normalizers (/root/reference/utils/
whisper_extractor/normalizers/ — dead code for SVC, SURVEY §2.5):

* :class:`BasicTextNormalizer` — unicode symbol/diacritic removal +
  lowercase + whitespace collapse (normalizers/basic.py:27-71 semantics),
* :class:`EnglishTextNormalizer` — bracket/parenthesis removal,
  contraction expansion, punctuation stripping, and (when the reference's
  english.json data table is present) British→American spelling
  normalisation (normalizers/english.py:12-543 core behaviour).
"""

from __future__ import annotations

import json
import os
import re
import unicodedata
from typing import Dict, Optional

_REFERENCE_SPELLING = (
    "/root/reference/utils/whisper_extractor/normalizers/english.json"
)


def remove_symbols_and_diacritics(s: str, keep: str = "") -> str:
    """Replace markers/symbols/punctuation with a space, drop diacritics."""
    out = []
    for c in unicodedata.normalize("NFKD", s):
        if c in keep:
            out.append(c)
        elif unicodedata.category(c) == "Mn":
            continue  # combining mark (diacritic)
        elif unicodedata.category(c)[0] in "MSP":
            out.append(" ")
        else:
            out.append(c)
    return "".join(out)


def remove_symbols(s: str) -> str:
    """Replace markers/symbols/punctuation with a space (keep diacritics)."""
    return "".join(
        " " if unicodedata.category(c)[0] in "MSP" else c
        for c in unicodedata.normalize("NFKC", s)
    )


class BasicTextNormalizer:
    def __init__(self, remove_diacritics: bool = False, split_letters: bool = False):
        self.clean = (
            remove_symbols_and_diacritics if remove_diacritics else remove_symbols
        )
        self.split_letters = split_letters

    def __call__(self, s: str) -> str:
        s = s.lower()
        s = re.sub(r"[<\[][^>\]]*[>\]]", "", s)  # bracketed annotations
        s = re.sub(r"\(([^)]+?)\)", "", s)  # parenthesised annotations
        s = self.clean(s).lower()
        if self.split_letters:
            s = " ".join(re.findall(r"\X", s, re.U))
        return re.sub(r"\s+", " ", s).strip()


_CONTRACTIONS: Dict[str, str] = {
    r"\bwon't\b": "will not",
    r"\bcan't\b": "can not",
    r"\blet's\b": "let us",
    r"\bain't\b": "aint",
    r"\by'all\b": "you all",
    r"\bwanna\b": "want to",
    r"\bgotta\b": "got to",
    r"\bgonna\b": "going to",
    r"\bi'ma\b": "i am going to",
    r"\bimma\b": "i am going to",
    r"\bwoulda\b": "would have",
    r"\bcoulda\b": "could have",
    r"\bshoulda\b": "should have",
    r"\bma'am\b": "madam",
    r"(\w+)'ll\b": r"\1 will",
    r"(\w+)n't\b": r"\1 not",
    r"(\w+)'ve\b": r"\1 have",
    r"(\w+)'re\b": r"\1 are",
    r"\bi'm\b": "i am",
    r"(\w+)'d\b": r"\1 would",
}

_TITLES = {
    r"\bmr\b": "mister ",
    r"\bmrs\b": "missus ",
    r"\bst\b": "saint ",
    r"\bdr\b": "doctor ",
    r"\bprof\b": "professor ",
}


class EnglishTextNormalizer:
    def __init__(self, spelling_file: Optional[str] = _REFERENCE_SPELLING):
        self.spelling: Dict[str, str] = {}
        if spelling_file and os.path.exists(spelling_file):
            with open(spelling_file) as f:
                self.spelling = json.load(f)

    def __call__(self, s: str) -> str:
        s = s.lower()
        s = re.sub(r"[<\[][^>\]]*[>\]]", "", s)
        s = re.sub(r"\(([^)]+?)\)", "", s)
        s = re.sub(r"\s+'", "'", s)  # standalone apostrophe spacing
        for pattern, repl in _TITLES.items():
            s = re.sub(pattern, repl, s)
        for pattern, repl in _CONTRACTIONS.items():
            s = re.sub(pattern, repl, s)
        s = re.sub(r"(\d),(\d)", r"\1\2", s)  # 1,000 → 1000
        s = re.sub(r"\.([^0-9]|$)", r" \1", s)  # keep decimal points only
        s = remove_symbols_and_diacritics(s, keep=".%$¢€£")
        if self.spelling:
            s = " ".join(self.spelling.get(w, w) for w in s.split())
        return re.sub(r"\s+", " ", s).strip()
