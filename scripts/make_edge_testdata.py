#!/usr/bin/env python3
"""Build a derived testdata dir with adversarial edge-case documents
planted, to prove the cross-engine oracle contract does NOT depend on
the generated corpus's "no text shorter than 48 chars" property
(round-2 verdict item 7).

Planted rows (doc_ids above the natural range):
  - empty text            ("" — no tokens, no shingles, no payload bytes)
  - whitespace-only text  (spaces: trims to empty)
  - tab-leading text      (regex-split yields a leading EMPTY token on
                           both engines — the nastiest parity corner)
  - single-token text     (shingle count = max(len-n+1, 1) floor case)
  - two-char text         (shorter than winnow k, char-gram padding case)
  - trailing-tab text     (regex-split yields a trailing EMPTY token on
                           both engines — the mirror of the leading case)
  - trailing-newline text (same corner via a different whitespace char)

Usage: python3 scripts/make_edge_testdata.py SRC_SF_DIR DST_DIR
Everything except documents.parquet is symlinked; documents.parquet is
rewritten with the planted rows appended.
"""
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq


def main(src: str, dst: str) -> None:
    os.makedirs(dst, exist_ok=True)
    for name in os.listdir(src):
        if name == "documents.parquet" or name.startswith("."):
            continue
        link = os.path.join(dst, name)
        if not os.path.exists(link):
            # absolute target: symlinks resolve relative to the LINK's
            # directory, so a relative SRC would dangle
            os.symlink(os.path.abspath(os.path.join(src, name)), link)

    t = pq.read_table(os.path.join(src, "documents.parquet"))
    base = t.num_rows  # natural doc_ids are 0..n-1; plant above
    next_id = max(t.column("doc_id").to_pylist()) + 1
    edge_texts = [
        "",
        "     ",
        "\tindented first line and then some text",
        "solo",
        "ab",
        "body text that ends in a tab\t",
        "body text that ends in a newline\n",
        # one token repeated: periodic k-gram runs (x43 interval union),
        # a single distinct bigram repeated (x46), max_freq_ratio = 1
        "rep " * 40,
        # exactly 8 tokens: the x43 span-width boundary (one k-gram)
        "t1 t2 t3 t4 t5 t6 t7 t8",
        # 7 tokens: one below the boundary (no k-gram at all)
        "u1 u2 u3 u4 u5 u6 u7",
        # identical line repeated with blank separators (x40 dup-line
        # fractions with blanks excluded)
        "same line\n\nsame line\n\nsame line",
        # Unicode parity probes: code-point lengths, UTF-8 md5 hashing,
        # \s regex splits, lower() behavior must agree across engines
        "café naïve résumé straße",
        "你好世界 日本語の文書",
        "emoji \U0001f600 beyond-bmp \U0001f9ea end",
        "mixed CASE ÉÈ and TÜRKÇE text",
    ]
    rows = {
        "doc_id": [next_id + i for i in range(len(edge_texts))],
        "text": edge_texts,
        "lang": ["en"] * len(edge_texts),
        "source": ["edge"] * len(edge_texts),
        "n_chars": [len(s) for s in edge_texts],
    }
    edge = pa.table(rows, schema=t.schema)
    out = pa.concat_tables([t, edge])
    pq.write_table(out, os.path.join(dst, "documents.parquet"))
    print(f"wrote {out.num_rows} docs ({base} natural + {len(edge_texts)} edge) "
          f"to {dst}/documents.parquet")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
