"""Answer-in-passage matching for retrieval recall@k.

Parity targets: ``/root/reference/tasks/openqa/dense_retriever/evaluation/
qa_validation.py:29-136`` (``calculate_matches``/``check_answer``/
``has_answer``/``regex_match``) and the DrQA ``SimpleTokenizer``
(``evaluation/tokenizers.py``) — reimplemented fresh with the ``regex``
module's unicode classes: words are ``[\\p{L}\\p{N}\\p{M}]+`` runs, anything
else non-space is its own token; matching is an uncased token-subsequence
test after NFD normalization.
"""

from __future__ import annotations

import re
import unicodedata
from multiprocessing.pool import ThreadPool
from typing import Callable, List, NamedTuple, Sequence, Tuple

import regex as uregex

_WORD = uregex.compile(r"[\p{L}\p{N}\p{M}]+|[^\p{Z}\p{C}]", uregex.UNICODE)


class SimpleTokenizer:
    """Regex word tokenizer (DrQA-equivalent behavior for answer matching)."""

    def tokenize(self, text: str) -> List[str]:
        return [m.group() for m in _WORD.finditer(text)]

    def words(self, text: str, uncased: bool = True) -> List[str]:
        toks = self.tokenize(text)
        return [t.lower() for t in toks] if uncased else toks


def _normalize(text: str) -> str:
    return unicodedata.normalize("NFD", text)


def regex_match(text: str, pattern: str) -> bool:
    try:
        compiled = re.compile(pattern,
                              flags=re.IGNORECASE | re.UNICODE | re.MULTILINE)
    except re.error:
        return False
    return compiled.search(text) is not None


def has_answer(answers: Sequence[str], text: str,
               tokenizer: SimpleTokenizer, match_type: str = "string") -> bool:
    """True iff any answer occurs in the passage (token-subsequence for
    'string', full-text regex for 'regex') — qa_validation.py:100-126."""
    text = _normalize(text)
    if match_type == "regex":
        return any(regex_match(text, _normalize(a)) for a in answers)

    words = tokenizer.words(text)
    for answer in answers:
        ans = tokenizer.words(_normalize(answer))
        if not ans:
            continue
        for i in range(len(words) - len(ans) + 1):
            if words[i: i + len(ans)] == ans:
                return True
    return False


class QAMatchStats(NamedTuple):
    top_k_hits: List[int]            # cumulative hits at each rank
    questions_doc_hits: List[List[bool]]


def calculate_matches(doc_text_fn: Callable[[int], str],
                      answers: Sequence[Sequence[str]],
                      closest_docs: Sequence[Tuple[Sequence[int], Sequence[float]]],
                      workers_num: int = 4,
                      match_type: str = "string") -> QAMatchStats:
    """Per-question top-k answer hits + the cumulative top_k_hits vector
    (qa_validation.py:29-74). ``doc_text_fn`` maps passage id -> text."""
    tokenizer = SimpleTokenizer()

    def check(args):
        ans, (doc_ids, _scores) = args
        return [has_answer(ans, doc_text_fn(int(d)), tokenizer, match_type)
                for d in doc_ids]

    items = list(zip(answers, closest_docs))
    if workers_num > 1:
        with ThreadPool(workers_num) as pool:
            scores = pool.map(check, items)
    else:
        scores = [check(it) for it in items]

    n_docs = len(closest_docs[0][0])
    top_k_hits = [0] * n_docs
    for hits in scores:
        best = next((i for i, x in enumerate(hits) if x), None)
        if best is not None:
            for j in range(best, n_docs):
                top_k_hits[j] += 1
    return QAMatchStats(top_k_hits, scores)
