"""Deterministic sentence + word tokenizer (vendored, no downloads).

Replaces the reference's NLTK punkt/treebank dependency
(/root/reference/graphrag/graphrag/__init__.py:12-41 downloads punkt +
stopwords at import time; chunker at core/ingest.py:79-94 and n-grams at
core/nlp_graph.py:45 call ``nltk.sent_tokenize`` / ``nltk.word_tokenize``).

The engine vendors its own punkt-style sentence splitter and treebank-style
word splitter: pure compiled-regex functions, identical output on every
worker, every run, every parallelism level. These functions DEFINE the golden
semantics for chunk packing, n-gram extraction and sentence fan-out
(SURVEY.md §7.5 item 2 — NLTK parity is a weight-level property we replace
with a deterministic contract).
"""

from __future__ import annotations

import re

# Abbreviations that do not end a sentence when followed by a period
# (punkt-style known-abbreviation list, lowercased, period-stripped).
ABBREVIATIONS = frozenset(
    """
    mr mrs ms dr prof rev fr st jr sr inc ltd co corp vs etc al eg ie
    e.g i.e u.s u.k no vol fig approx dept est min max
    jan feb mar apr jun jul aug sep sept oct nov dec
    """.split()
)

# Sentence boundary: terminator [.!?]+ optionally followed by closing
# quote/bracket, then whitespace, then an upper-case letter, digit or
# opening quote starting the next sentence.
_BOUNDARY = re.compile(r'([.!?]+[\"\')\]]?)(\s+)(?=[\"\'(\[]?[A-Z0-9])')

# treebank-style word tokens: word cores with internal apostrophes/periods
# (keeps "U.S." and "don't" whole), numbers with separators, else single
# punctuation marks. Unicode word characters ([^\W_] = letters+digits,
# any script) so "Café"/"François" stay single tokens.
_WORD = re.compile(
    r"[^\W_]+(?:[.'’&-][^\W_]+)*|[^\w\s]|_"
)

_LAST_TOKEN = re.compile(r"[A-Za-z][A-Za-z.\-]*$")


def sent_tokenize(text: str) -> list[str]:
    """Split text into sentences.

    Deterministic punkt-style rules: break after [.!?] + optional closing
    quote when followed by whitespace and a capital/digit, unless the token
    before the period is a known abbreviation or a single capital initial
    ("J. Smith"). Newlines ("\\n\\n") always break. A text with no terminator
    is one sentence (this is what makes the chunker's
    longer-than-max_tokens single-sentence rule reachable,
    /root/reference/graphrag/core/ingest.py:87-94).
    """
    sentences: list[str] = []
    for block in text.split("\n"):
        block = block.strip()
        if not block:
            continue
        start = 0
        for m in _BOUNDARY.finditer(block):
            end = m.end(1)
            candidate = block[start:end]
            # token immediately before the terminator
            head = candidate[: len(candidate) - len(m.group(1))]
            last = _LAST_TOKEN.search(head)
            if last is not None and m.group(1).startswith("."):
                tok = last.group(0).lower().rstrip(".")
                if tok in ABBREVIATIONS or (len(tok) == 1):
                    continue  # abbreviation / initial: not a boundary
            sentences.append(candidate.strip())
            start = m.end(2)
        tail = block[start:].strip()
        if tail:
            sentences.append(tail)
    return sentences


def word_tokenize(text: str) -> list[str]:
    """Split a sentence into word tokens (treebank-style, deterministic).

    "U.S." and "don't" stay single tokens; other punctuation becomes its own
    token. Used by the chunker for token counting
    (/root/reference/graphrag/core/ingest.py:86) and by the n-gram extractor
    (core/nlp_graph.py:45).
    """
    return _WORD.findall(text)


def ngrams(tokens: list[str], n: int) -> list[str]:
    """Space-joined n-grams over a token list (nltk.bigrams/trigrams +
    ' '.join, /root/reference/graphrag/core/nlp_graph.py:54-55)."""
    if len(tokens) < n:
        return []
    return [" ".join(tokens[i : i + n]) for i in range(len(tokens) - n + 1)]


# NLTK English stopword list (public domain word list; the reference loads it
# from nltk.corpus.stopwords at core/nlp_graph.py:16).
STOPWORDS = frozenset(
    """
    i me my myself we our ours ourselves you you're you've you'll you'd your
    yours yourself yourselves he him his himself she she's her hers herself
    it it's its itself they them their theirs themselves what which who whom
    this that that'll these those am is are was were be been being have has
    had having do does did doing a an the and but if or because as until
    while of at by for with about against between into through during before
    after above below to from up down in out on off over under again further
    then once here there when where why how all any both each few more most
    other some such no nor not only own same so than too very s t can will
    just don don't should should've now d ll m o re ve y ain aren aren't
    couldn couldn't didn didn't doesn doesn't hadn hadn't hasn hasn't haven
    haven't isn isn't ma mightn mightn't mustn mustn't needn needn't shan
    shan't shouldn shouldn't wasn wasn't weren weren't won won't wouldn
    wouldn't
    """.split()
)
