"""Deterministic synthetic source-code corpus in the input-hint schema
``(repo, path, commit, lang, content)`` (FIXTURES.md §1).

Zipfian keyword mix (``the/if/return/import``...), camelCase/snake_case
identifiers, dotted package names, numbers, punctuation, >255-char tokens
(to exercise the skip-token position rule), empty files and duplicate files.
Seeded numpy generation — no external data.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

KEYWORDS = [
    "the", "if", "return", "import", "for", "while", "else", "def", "class",
    "public", "static", "void", "int", "new", "null", "true", "false", "try",
    "catch", "final", "self", "None", "lambda", "print", "struct", "func",
]
IDENT_PARTS = [
    "get", "set", "index", "writer", "reader", "term", "doc", "query", "score",
    "merge", "field", "token", "stream", "buffer", "block", "posting", "norm",
    "hash", "util", "search", "build", "flush", "commit", "seg", "max", "min",
]
LANGS = ["java", "py", "c", "go", "js", "md"]
PUNCT = ["(", ")", "{", "}", ";", "=", "+", "-", "->", "==", ",", "."]


def _make_identifier(rng: np.random.Generator) -> str:
    n = rng.integers(1, 4)
    parts = [IDENT_PARTS[rng.integers(0, len(IDENT_PARTS))] for _ in range(n)]
    style = rng.integers(0, 3)
    if style == 0:  # camelCase
        return parts[0] + "".join(p.capitalize() for p in parts[1:])
    if style == 1:  # snake_case
        return "_".join(parts)
    return ".".join(parts)  # dotted


def _make_content(rng: np.random.Generator, n_tokens: int) -> str:
    # Zipfian keyword frequencies + identifiers + numbers + punctuation
    zipf_p = 1.0 / np.arange(1, len(KEYWORDS) + 1)
    zipf_p /= zipf_p.sum()
    toks: list[str] = []
    for _ in range(n_tokens):
        r = rng.random()
        if r < 0.55:
            toks.append(KEYWORDS[rng.choice(len(KEYWORDS), p=zipf_p)])
        elif r < 0.85:
            toks.append(_make_identifier(rng))
        elif r < 0.92:
            toks.append(str(rng.integers(0, 100000)))
        elif r < 0.99:
            toks.append(PUNCT[rng.integers(0, len(PUNCT))])
        else:
            toks.append("z" * int(rng.integers(256, 300)))  # skip-rule exerciser
    return " ".join(toks)


def generate_corpus(n_docs: int, seed: int = 42) -> pd.DataFrame:
    """n_docs rows of (repo, path, commit, lang, content), deterministic."""
    rng = np.random.default_rng(seed)
    rows = []
    n_repos = max(1, n_docs // 20)
    for i in range(n_docs):
        # Zipfian repo sizes: low repo ids get most files
        repo_id = min(int(rng.zipf(1.3)) - 1, n_repos - 1)
        lang = LANGS[rng.integers(0, len(LANGS))]
        path = f"src/m{i % 7}/file_{i}.{lang}"
        commit = hashlib.sha1(f"commit-{seed}-{i % 97}".encode()).hexdigest()
        if rng.random() < 0.01:
            content = ""  # empty files
        elif rng.random() < 0.03 and rows:
            content = rows[rng.integers(0, len(rows))][4]  # duplicate files
        else:
            content = _make_content(rng, int(rng.integers(5, 120)))
        rows.append((f"org/project-{repo_id}", path, commit, lang, content))
    return pd.DataFrame(
        rows, columns=["repo", "path", "commit", "lang", "content"]
    )
