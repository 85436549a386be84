"""DuckDB twin of corpus-scale BPE merge training (operators/bpe.py)
— the round-10 graduation of the registry's LAST rows-only entry.

The r9 impossibility note said the within-word re-tokenize is
sequential (left-to-right, non-overlapping replacement of the winning
pair) and therefore outside bounded SQL. The doubled-separator
encoding dissolves that: represent a word's symbol sequence as the
concatenation of ``SEP || sym || SEP`` units (SEP = chr(31), a byte
the [a-z0-9] token alphabet cannot contain). Then one standard SQL
``replace(s, SEP||l||SEP || SEP||r||SEP, SEP||l||r||SEP)`` IS the
sequential merge kernel:

- a match can only start at a unit's leading SEP (symbols contain no
  SEP), and consumes exactly the two full units of (l, r);
- replace() scans left to right and resumes AFTER the replacement, so
  a run like ``l l l l l`` merges to ``ll ll l`` — byte-identical to
  the engine kernel's i += 2 advance (the case the shared-boundary
  single-SEP encoding gets wrong: its match consumes the next unit's
  leading SEP and skips it).

With re-tokenization expressible, the whole training loop unrolls as
a bounded CTE chain (the pagerank / kmeans_oracle discipline): round
k = one pair-count GROUP BY over tok_{k-1} + a 1-row argmax (ORDER BY
cnt DESC, l, r — the engine's exact tie-break) + one replace() join.
Counts are integer sums of integer word frequencies — engine-portable
with no rounding discipline needed at all.

The engine side trains with BATCHED rounds (operators/bpe.py
_select_batch), pinned bit-identical to one-merge-per-round by
tests/test_bpe.py; this oracle is the sequential form, so agreement
also re-attests the batching proof on every gate run.
"""

from __future__ import annotations


def bpe_merges_oracle(num_merges: int, tokenize_sql: str) -> str:
    """Unrolled-CTE DuckDB twin of ``train_bpe_merges`` over the
    ``documents`` view: emits (rank, left, right, pair_freq) for the
    first ``num_merges`` merges, matching q_bpe_merges bit-for-bit.
    ``tokenize_sql`` is the shared normalized_tokens twin
    (queries._TOKENIZE_SQL) applied to the ``text`` column."""
    parts = [
        f"""
words AS MATERIALIZED (
    SELECT word, CAST(count(*) AS BIGINT) AS freq
    FROM (SELECT unnest({tokenize_sql}) AS word FROM documents)
    GROUP BY word
),
tok0 AS MATERIALIZED (
    SELECT freq,
           list_aggregate(
               list_transform(string_split(word, ''),
                              c -> chr(31) || c || chr(31)),
               'string_agg', '') AS s
    FROM words
)"""
    ]
    for k in range(1, num_merges + 1):
        prev = f"tok{k - 1}"
        parts.append(f"""
win{k} AS MATERIALIZED (
    SELECT p[1] AS l, p[2] AS r, CAST(sum(freq) AS BIGINT) AS cnt
    FROM (
        SELECT freq,
               unnest(list_zip(list_slice(syms, 1, len(syms) - 1),
                               list_slice(syms, 2, len(syms)))) AS p
        FROM (SELECT freq,
                     list_filter(string_split(s, chr(31)),
                                 x -> x <> '') AS syms
              FROM {prev})
    )
    GROUP BY 1, 2
    ORDER BY cnt DESC, l, r
    LIMIT 1
)""")
        if k < num_merges:  # the last tokenization is never re-counted
            parts.append(f"""
tok{k} AS MATERIALIZED (
    SELECT t.freq,
           replace(t.s,
                   chr(31) || w.l || chr(31) || chr(31) || w.r || chr(31),
                   chr(31) || w.l || w.r || chr(31)) AS s
    FROM {prev} t, win{k} w
)""")
    union = "\nUNION ALL\n".join(
        f'SELECT CAST({k - 1} AS INT) AS rank, l AS "left", r AS "right",'
        f" cnt AS pair_freq FROM win{k}"
        for k in range(1, num_merges + 1)
    )
    return f"WITH {','.join(parts)}\n{union}\nORDER BY rank"
