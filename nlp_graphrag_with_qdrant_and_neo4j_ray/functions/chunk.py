"""Sentence-pack chunker + n-gram extraction — exact reference semantics.

Chunker (/root/reference/graphrag/core/ingest.py:65-101): greedy sentence
accumulation; flush BEFORE appending when the incoming sentence would
overflow a non-empty chunk — so a single sentence longer than ``max_tokens``
still forms (or extends) a chunk; chunks joined with a single space; the
trailing partial chunk is emitted.

N-grams (/root/reference/graphrag/core/nlp_graph.py:35-58): tokens are
lowercased alnum word tokens; unigrams are stopword-filtered (when enabled);
bigrams/trigrams are built from the UNFILTERED token list (a load-bearing
reference quirk, SURVEY.md M4).
"""

from __future__ import annotations

from .tokenize import STOPWORDS, ngrams, sent_tokenize, word_tokenize


def chunk_text(text: str, max_tokens: int = 200) -> list[tuple[str, int]]:
    """Return [(chunk_text, n_tokens), ...] for one document."""
    if not text:
        return []
    chunks: list[tuple[str, int]] = []
    current: list[str] = []
    current_len = 0
    for sent in sent_tokenize(text):
        n_tok = len(word_tokenize(sent))
        if current_len + n_tok > max_tokens and current:
            chunks.append((" ".join(current), current_len))
            current = []
            current_len = 0
        current.append(sent)
        current_len += n_tok
    if current:
        chunks.append((" ".join(current), current_len))
    return chunks


def extract_ngrams(
    text: str, remove_stopwords: bool = True
) -> tuple[list[str], list[str], list[str]]:
    """(unigrams, bigrams, trigrams) for one chunk text."""
    tokens = [w.lower() for w in word_tokenize(text) if w.isalnum()]
    if remove_stopwords:
        unigrams = [t for t in tokens if t not in STOPWORDS]
    else:
        unigrams = tokens
    return unigrams, ngrams(tokens, 2), ngrams(tokens, 3)
