"""Host-side text utilities: DrQA-style regex tokenizer + answer matching.

Re-implementation of the utilities the reference vendors from DrQA
(mdr/retrieval/utils/basic_tokenizer.py, duplicated at mdr/qa/
basic_tokenizer.py) and the answer-recall matcher
(mdr/retrieval/utils/utils.py:126-139): answer strings are matched against
passage text as normalized token subsequences.
"""

from __future__ import annotations

from typing import List, Sequence

import regex


class SimpleTokenizer:
    """Regex word tokenizer: alphanumeric runs (with marks) or single
    non-space chars; supports uncased + ungrouped views (DrQA semantics)."""

    ALPHA_NUM = r"[\p{L}\p{N}\p{M}]+"
    NON_WS = r"[^\p{Z}\p{C}]"

    def __init__(self):
        self._re = regex.compile(
            f"({self.ALPHA_NUM})|({self.NON_WS})",
            flags=regex.IGNORECASE + regex.UNICODE + regex.MULTILINE)

    def tokenize(self, text: str) -> List[str]:
        return [m.group() for m in self._re.finditer(text)]

    def words(self, text: str, uncased: bool = True) -> List[str]:
        toks = self.tokenize(text)
        return [t.lower() for t in toks] if uncased else toks


from ..data.corpus import nfd_normalize as _normalize


def para_has_answer(answers: Sequence[str], para: str,
                    tokenizer: SimpleTokenizer) -> bool:
    """True iff any gold answer appears as a token subsequence of `para`
    (utils/utils.py:126-139)."""
    text = tokenizer.words(_normalize(para), uncased=True)
    for answer in answers:
        ans_toks = tokenizer.words(_normalize(answer), uncased=True)
        n = len(ans_toks)
        if n == 0:
            continue
        for i in range(0, len(text) - n + 1):
            if text[i:i + n] == ans_toks:
                return True
    return False


