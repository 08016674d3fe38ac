"""Treebank-style word tokenizer, implemented from the published rule set.

The reference tokenizes with NLTK's ``word_tokenize`` (Punkt sentence split +
TreebankWordTokenizer); its C++ fast path re-implements the Treebank rules as
an ordered regex-replace chain and deliberately omits the sentence split
(reference: packages/docling-metrics-text/cpp/src/treebank.cpp:11-67 and the
TODO at cpp/src/text_manager.cpp:14-19). We follow the same design: one
ordered chain of regular-expression rewrites derived from the *published*
Penn-Treebank tokenization conventions, then a whitespace split. nltk is not
available in this environment, so this module is both the engine kernel and
the test oracle.
"""

from __future__ import annotations

import re

# Ordered rewrite rules. Each is (compiled_pattern, replacement).
# Group 1: starting quotes.
_STARTING_QUOTES = [
    (re.compile(r"^\""), r"``"),
    (re.compile(r"(``)"), r" \1 "),
    (re.compile(r"([ \(\[{<])(\"|\'{2})"), r"\1 `` "),
]

# Group 2: punctuation.
_PUNCTUATION = [
    (re.compile(r"([:,])([^\d])"), r" \1 \2"),
    (re.compile(r"([:,])$"), r" \1 "),
    (re.compile(r"\.\.\."), r" ... "),
    (re.compile(r"[;@#$%&]"), r" \g<0> "),
    # Final period (possibly followed by closing brackets/quotes) at end.
    (re.compile(r"([^\.])(\.)([\]\)}>\"\']*)\s*$"), r"\1 \2\3 "),
    (re.compile(r"[?!]"), r" \g<0> "),
    (re.compile(r"([^'])' "), r"\1 ' "),
]

# Group 3: parens, brackets, dashes.
_PARENS_BRACKETS = [
    (re.compile(r"[\]\[\(\)\{\}<>]"), r" \g<0> "),
    (re.compile(r"--"), r" -- "),
]

# Group 4: ending quotes.
_ENDING_QUOTES = [
    (re.compile(r"\""), " '' "),
    (re.compile(r"(\S)(\'\')"), r"\1 \2 "),
    (re.compile(r"([^' ])('[sS]|'[mM]|'[dD]|') "), r"\1 \2 "),
    (re.compile(r"([^' ])('ll|'LL|'re|'RE|'ve|'VE|n't|N'T) "), r"\1 \2 "),
]

# Group 5: common English contractions split as two tokens.
_CONTRACTIONS = [
    re.compile(r"(?i)\b(can)(not)\b"),
    re.compile(r"(?i)\b(d)('ye)\b"),
    re.compile(r"(?i)\b(gim)(me)\b"),
    re.compile(r"(?i)\b(gon)(na)\b"),
    re.compile(r"(?i)\b(got)(ta)\b"),
    re.compile(r"(?i)\b(lem)(me)\b"),
    re.compile(r"(?i)\b(mor)('n)\b"),
    re.compile(r"(?i)\b(wan)(na)(?=\s)"),
    re.compile(r"(?i) ('t)(is)\b"),
    re.compile(r"(?i) ('t)(was)\b"),
]


# Texts containing only word characters and spaces can only be touched by
# the apostrophe-free contraction rules (cannot/gimme/gonna/gotta/lemme/
# wanna); everything else anchors on punctuation or quotes. When neither
# applies, tokenization degenerates to a whitespace split.
_NO_RULE_RE = re.compile(r"[A-Za-z0-9 \n\t]*\Z")
_PLAIN_CONTRACTIONS = {"cannot", "gimme", "gonna", "gotta", "lemme", "wanna"}


def treebank_tokenize(text: str) -> list[str]:
    """Tokenize ``text`` into Penn-Treebank-style word tokens.

    Deterministic, pure-Python; no sentence splitting (matching the
    reference's C++ fast path which omits Punkt).
    """
    if text is None:
        return []
    if _NO_RULE_RE.match(text):
        toks = text.split()
        if not any(t.lower() in _PLAIN_CONTRACTIONS for t in toks):
            # fast path: no rule can fire — same result as the full chain
            return toks
    for pat, repl in _STARTING_QUOTES:
        text = pat.sub(repl, text)
    for pat, repl in _PUNCTUATION:
        text = pat.sub(repl, text)
    for pat, repl in _PARENS_BRACKETS:
        text = pat.sub(repl, text)
    # Pad so the ending-quote / contraction rules (which anchor on a
    # trailing space) can fire at the end of the string.
    text = " " + text + " "
    for pat, repl in _ENDING_QUOTES:
        text = pat.sub(repl, text)
    for pat in _CONTRACTIONS:
        text = pat.sub(r" \1 \2 ", text)
    return text.split()
