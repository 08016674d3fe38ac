"""Treebank word tokenizer — bit-exact re-expression of the reference's
C++ rule chain.

The reference's Python path tokenizes with NLTK ``word_tokenize`` (Punkt +
TreebankWordTokenizer); its C++ fast path re-implements the Treebank rules
as an ordered RE2 replace chain and deliberately omits the sentence split
(reference: packages/docling-metrics-text/cpp/src/treebank.cpp:11-128 and
the TODO at cpp/src/text_manager.cpp:14-19). This module transcribes that
C++ chain rule-for-rule — same patterns, same order, same replacements —
so the engine's tokenization is token-for-token identical to the
reference's C++ mode (which differs from NLTK in three ways the chain
makes explicit below: the ``('')`` ending-quote rule, the absence of
NLTK's ``(\\S)('')`` rule, and ``more'n`` instead of ``mor'n``).

RE2-vs-Python-`re` semantics are mirrored explicitly:

- RE2 character classes (``\\b \\d \\w``) are ASCII-only → every pattern
  is compiled with ``re.ASCII``.
- RE2 ``(?i)`` is Unicode SIMPLE case folding (so ``s`` folds with
  ``ſ`` U+017F, but ``i`` does NOT fold with Turkic ``ı``/``İ``), while
  its ``\\b`` stays ASCII — neither of Python's flag sets reproduces
  that mix, so folded literals are spelled as explicit fold-orbit
  classes (:func:`_ci`) and ``(?i)`` is never used.
- RE2 ``$`` matches end-of-text only (no final-newline magic) → ``\\Z``.
- RE2 ``\\s`` is ``[\\t\\n\\f\\r ]`` (NO vertical tab) → spelled out.
- ``\\0`` (whole match) in RE2 replacements → ``\\g<0>``.
- The C++ final split (``istringstream >>``) splits on C-locale isspace
  ``[ \\t\\n\\v\\f\\r]`` (WITH vertical tab, unlike RE2's ``\\s``) and
  treats multi-byte UTF-8 as opaque non-space bytes → an explicit ASCII
  whitespace split, never ``str.split()`` (which splits on Unicode
  spaces the C++ keeps inside tokens).
"""

from __future__ import annotations

import re

_A = re.ASCII

# treebank.cpp:12-17 — starting quotes.
_STARTING_QUOTES = [
    (re.compile(r"^\"", _A), r"``"),
    (re.compile(r"(``)", _A), r" \1 "),
    (re.compile(r"([ \(\[{<])(\"|\'{2})", _A), r"\1 `` "),
]

# treebank.cpp:19-29 — punctuation.
_PUNCTUATION = [
    (re.compile(r"([:,])([^\d])", _A), r" \1 \2"),
    (re.compile(r"([:,])\Z", _A), r" \1 "),
    (re.compile(r"\.\.\.", _A), r" ... "),
    (re.compile(r"[;@#$%&]", _A), r" \g<0> "),
    # Final period (possibly followed by closing brackets/quotes) at the
    # end of the text; RE2 `\s*$` = ASCII-space run to end-of-text.
    (re.compile(r"([^\.])(\.)([\]\)}>\"\']*)[\t\n\f\r ]*\Z", _A), r"\1 \2\3 "),
    (re.compile(r"[?!]", _A), r" \g<0> "),
    (re.compile(r"([^'])' ", _A), r"\1 ' "),
]

# treebank.cpp:31-33 — parentheses and brackets.
_PARENS_BRACKETS = (re.compile(r"[\]\[\(\)\{\}\<\>]", _A), r" \g<0> ")

# treebank.cpp:35-41 — optional PTB bracket-token conversion (the
# reference's default is convert_parentheses=false, treebank.h:25).
_CONVERT_PARENTHESES = [
    (re.compile(r"\(", _A), "-LRB-"),
    (re.compile(r"\)", _A), "-RRB-"),
    (re.compile(r"\[", _A), "-LSB-"),
    (re.compile(r"\]", _A), "-RSB-"),
    (re.compile(r"\{", _A), "-LCB-"),
    (re.compile(r"\}", _A), "-RCB-"),
]

# treebank.cpp:43-44 — double dashes.
_DOUBLE_DASHES = (re.compile(r"--", _A), r" -- ")

# treebank.cpp:46-53 — ending quotes, in the C++ order: the bare `('')`
# rule runs FIRST (NLTK instead has a `(\S)('')` rule later — the C++
# chain is the parity target here, not NLTK).
_ENDING_QUOTES = [
    (re.compile(r"''", _A), " '' "),
    (re.compile(r"\"", _A), " '' "),
    (re.compile(r"([^' ])('[sS]|'[mM]|'[dD]|') ", _A), r"\1 \2 "),
    (re.compile(r"([^' ])('ll|'LL|'re|'RE|'ve|'VE|n't|N'T) ", _A), r"\1 \2 "),
]

# RE2 `(?i)` performs Unicode SIMPLE case folding (CaseFolding.txt C+S
# entries) even though its \b/\w stay ASCII — so the reference's
# case-insensitive contraction rules fold 'ſ' (U+017F) into the s orbit
# and 'K' (U+212A) into the k orbit, but do NOT fold 'ı'/'İ' (Turkic-only
# fold entries). Python can't mix ASCII \b with Unicode folding in one
# compiled flag set, and Python's own Unicode IGNORECASE OVER-folds
# (it matches ı/İ with i, per the re docs) — so each folded literal is
# spelled as its exact RE2 fold orbit and the patterns compile with
# re.ASCII and NO IGNORECASE.
_FOLD_ORBITS = {"s": "sSſ", "k": "kKK"}


def _ci(literal: str) -> str:
    """``literal`` as a regex matching RE2's (?i) simple-fold semantics."""
    out = []
    for ch in literal:
        if ch.isalpha() and ch.isascii():
            out.append("[" + _FOLD_ORBITS.get(ch, ch + ch.upper()) + "]")
        else:
            out.append(re.escape(ch))
    return "".join(out)


# treebank.cpp:55-65 — contractions, case-insensitive, replacement
# " \1 \2 ". Note `more'n` (the C++ pattern), not NLTK's `mor'n`; and the
# wanna rule CONSUMES a trailing RE2-\s (no lookahead in RE2).
_CONTRACTIONS2 = [
    re.compile(rf"\b({_ci('can')})({_ci('not')})\b", _A),
    re.compile(rf"\b({_ci('d')})({_ci(chr(39) + 'ye')})\b", _A),
    re.compile(rf"\b({_ci('gim')})({_ci('me')})\b", _A),
    re.compile(rf"\b({_ci('gon')})({_ci('na')})\b", _A),
    re.compile(rf"\b({_ci('got')})({_ci('ta')})\b", _A),
    re.compile(rf"\b({_ci('lem')})({_ci('me')})\b", _A),
    re.compile(rf"\b({_ci('more')})({_ci(chr(39) + 'n')})\b", _A),
    re.compile(rf"\b({_ci('wan')})({_ci('na')})[\t\n\f\r ]", _A),
]

# treebank.cpp:67-68.
_CONTRACTIONS3 = [
    re.compile(rf" ({_ci(chr(39) + 't')})({_ci('is')})\b", _A),
    re.compile(rf" ({_ci(chr(39) + 't')})({_ci('was')})\b", _A),
]

# istringstream `>>` split set: C-locale isspace (includes \v, which
# RE2's \s does not — both faithfully mirrored).
_SPLIT_RE = re.compile(r"[^ \t\n\v\f\r]+", _A)

# Texts containing only ASCII word characters and plain whitespace can
# only be touched by the apostrophe-free contraction rules
# (cannot/gimme/gonna/gotta/lemme/wanna); everything else anchors on
# punctuation or quotes. When neither applies, tokenization degenerates
# to the whitespace split.
_NO_RULE_RE = re.compile(r"[A-Za-z0-9 \n\t]*\Z", _A)
_PLAIN_CONTRACTIONS = {"cannot", "gimme", "gonna", "gotta", "lemme", "wanna"}


def treebank_tokenize(text: str, convert_parentheses: bool = False) -> list[str]:
    """Tokenize ``text`` into Penn-Treebank-style word tokens.

    Deterministic, pure Python, no sentence split — rule-for-rule the
    reference's ``TreeBankTokenizer::tokenize``
    (cpp/src/treebank.cpp:75-128)."""
    if text is None:
        return []
    if not convert_parentheses and _NO_RULE_RE.match(text):
        toks = text.split()
        if not any(t.lower() in _PLAIN_CONTRACTIONS for t in toks):
            # fast path: no rule can fire — same result as the full chain
            # (asserted against the chain in tests/test_tokenize_parity.py)
            return toks
    for pat, repl in _STARTING_QUOTES:
        text = pat.sub(repl, text)
    for pat, repl in _PUNCTUATION:
        text = pat.sub(repl, text)
    text = _PARENS_BRACKETS[0].sub(_PARENS_BRACKETS[1], text)
    if convert_parentheses:
        for pat, repl in _CONVERT_PARENTHESES:
            text = pat.sub(repl, text)
    text = _DOUBLE_DASHES[0].sub(_DOUBLE_DASHES[1], text)
    # treebank.cpp:103 — pad so end-anchored quote/contraction rules fire.
    text = " " + text + " "
    for pat, repl in _ENDING_QUOTES:
        text = pat.sub(repl, text)
    for pat in _CONTRACTIONS2:
        text = pat.sub(r" \1 \2 ", text)
    for pat in _CONTRACTIONS3:
        text = pat.sub(r" \1 \2 ", text)
    return _SPLIT_RE.findall(text)
