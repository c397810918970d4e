"""Text-analysis functions for large-scale training-data pipelines:
language ID (n-gram heuristic), quality scoring, token counting,
document fingerprinting. All deterministic, all vectorizable per batch."""

from __future__ import annotations

import hashlib
import re

from .tokenize import STOPWORDS

_WS_SPLIT = re.compile(r"\s+")
_WORD = re.compile(r"[a-zA-Z]+")
# a BPE-ish pre-tokenizer: GPT-2-style contraction/word/number/punct
# pieces. Deliberately NO lookahead (GPT-2 uses `\s+(?!\S)` to peel the
# last space off a run): the lookahead-free form yields the same TOKEN
# COUNT except inside mixed-whitespace runs, and keeps the pattern
# RE2-compatible so the DuckDB oracle computes the identical count by
# construction.
_BPE_ISH = re.compile(
    r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+"
)

# tiny per-language function-word profiles (public common-word lists)
_LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "in", "is", "was", "that", "for", "with"},
    "de": {"der", "die", "das", "und", "ist", "von", "mit", "für", "nicht", "ein"},
    "fr": {"le", "la", "les", "et", "est", "de", "des", "une", "dans", "pour"},
    "es": {"el", "la", "los", "y", "es", "de", "que", "en", "un", "por"},
}


def ws_token_count(text: str) -> int:
    """Whitespace token count; empty/blank → 0 (matches the SQL oracle
    ``len(regexp_split_to_array(trim(text),'\\s+'))`` with the empty guard)."""
    t = text.strip()
    return 0 if not t else len(_WS_SPLIT.split(t))


def bpe_ish_token_count(text: str) -> int:
    """Token count under a GPT-2-style pre-tokenization regex."""
    return len(_BPE_ISH.findall(text))


def detect_language(text: str) -> str:
    """N-gram/function-word language heuristic → best profile or 'und'."""
    words = set(w.lower() for w in _WORD.findall(text))
    if not words:
        return "und"
    best, best_hits = "und", 0
    for lang in sorted(_LANG_PROFILES):
        hits = len(words & _LANG_PROFILES[lang])
        if hits > best_hits:
            best, best_hits = lang, hits
    return best if best_hits >= 2 else "und"


def quality_scores(text: str) -> dict:
    """Deterministic quality signals: length, mean word length, alpha /
    punct / stopword / digit ratios, and a composite [0,1] score."""
    n_chars = len(text)
    words = _WORD.findall(text)
    n_words = len(words)
    n_alpha = sum(len(w) for w in words)
    n_punct = sum(1 for c in text if not c.isalnum() and not c.isspace())
    n_digit = sum(1 for c in text if c.isdigit())
    stop = sum(1 for w in words if w.lower() in STOPWORDS)
    mean_word_len = (n_alpha / n_words) if n_words else 0.0
    alpha_ratio = (n_alpha / n_chars) if n_chars else 0.0
    punct_ratio = (n_punct / n_chars) if n_chars else 0.0
    digit_ratio = (n_digit / n_chars) if n_chars else 0.0
    stopword_ratio = (stop / n_words) if n_words else 0.0
    # composite: prose-looking text scores high
    score = 0.0
    if n_words >= 5:
        score = (
            0.4 * min(1.0, alpha_ratio / 0.8)
            + 0.3 * min(1.0, stopword_ratio / 0.4)
            + 0.2 * (1.0 - min(1.0, punct_ratio / 0.3))
            + 0.1 * (1.0 - min(1.0, digit_ratio / 0.3))
        )
    return {
        "n_chars": n_chars,
        "n_words": n_words,
        "mean_word_len": mean_word_len,
        "alpha_ratio": alpha_ratio,
        "punct_ratio": punct_ratio,
        "digit_ratio": digit_ratio,
        "stopword_ratio": stopword_ratio,
        "quality": score,
    }


def fingerprint64(text: str, window: int = 8) -> int:
    """Rolling-hash document fingerprint: XOR of the blake2b-64 of each
    ``window``-gram of whitespace tokens (order-sensitive, local-change
    tolerant). Empty text → 0."""
    toks = text.split()
    if not toks:
        return 0
    if len(toks) < window:
        grams = [" ".join(toks)]
    else:
        grams = [" ".join(toks[i : i + window]) for i in range(len(toks) - window + 1)]
    fp = 0
    for g in grams:
        fp ^= int.from_bytes(
            hashlib.blake2b(g.encode("utf-8"), digest_size=8).digest(), "big"
        )
    return fp


def content_hash(text: str) -> str:
    """Exact-dup key: blake2b-128 hex of the raw text."""
    return hashlib.blake2b(text.encode("utf-8"), digest_size=16).hexdigest()
