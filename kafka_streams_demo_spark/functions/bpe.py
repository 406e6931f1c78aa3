"""Byte-pair-encoding tokenizer training and application — the standard
subword vocabulary pipeline (Sennrich, Haddow & Birch 2016, "Neural
Machine Translation of Rare Words with Subword Units") as a distributed
DataFrame algorithm.

Scale design (the textbook BPE trick, Spark-shaped):
- the corpus collapses to the WORD-TYPE table first — (word, n) via one
  explode + count shuffle. Every training round then runs over vocab
  rows (≈10⁵-10⁷), never corpus rows, no matter how many TB of text fed
  the counts.
- each merge round is: pair-count aggregate (explode adjacent symbol
  pairs weighted by word count — map-side combined) → ONE collected
  argmax row (bounded driver data, the kmeans_train pattern) →
  row-local greedy merge over each word's symbol array. The symbol
  table is localCheckpoint'ed per round — the lineage-truncation rule
  for iterative DataFrame algorithms (persist alone doubles the plan
  per round).
- encoding is embarrassingly parallel: the learned merge list (≤ a few
  thousand rows — bounded by construction) ships in a mapInPandas
  closure; each worker applies merges in rank order per word with a
  per-batch word cache.

Iterative — yet HASH-GATED since r12: with num_merges fixed, the merge
rounds unroll as MATERIALIZED DuckDB CTEs (``bpe_train_sql`` /
``bpe_token_counts_sql`` below — the pagerank_sql idiom), so both
catalog entries sit under the full cross-engine gate. The published
worked example (the Sennrich corpus), the train/encode consistency
invariant, detokenization round-trips, and the property test against a
pure-Python reference trainer all remain in tests/test_bpe.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END = "</w>"

# bpe_train_sql / bpe_token_counts_sql are parity-tested against the
# Spark trainer up to this many unrolled rounds (tests/test_bpe.py).
# The guard in _bpe_round_ctes refuses beyond it — see its message.
SQL_TESTED_MAX_MERGES = 40


def _word_types(docs: DataFrame, text_col: str) -> DataFrame:
    """(w, n) word-type table: lowercased whitespace tokens + counts."""
    return (
        docs.select(
            F.explode(
                F.filter(
                    F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), " "),
                    lambda x: x != "",
                )
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _merge_pair_expr(s, left: str, right: str):
    """Greedy left-to-right single-pass merge of adjacent (left, right)
    symbols inside array column ``s`` — the same semantics as the
    per-word Python kernel in ``bpe_encode`` (consistency is
    invariant-tested). Pure HOF fold: O(len) per word, row-local."""
    merged = F.lit(left + right)
    return F.aggregate(
        s,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(merged)
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train(
    docs: DataFrame,
    num_merges: int = 50,
    text_col: str = "text",
    min_pair_count: int = 2,
) -> DataFrame:
    """Learn ``num_merges`` BPE merge rules from the corpus. Returns the
    ordered merge table (rank, left, right, merged, n_pair) — the
    artifact ``bpe_encode`` applies and the thing a real pipeline
    persists next to its corpus.

    Determinism: the per-round argmax breaks ties by (count DESC, left
    ASC, right ASC), so training is reproducible across engines,
    partitionings and runs (the same discipline as every other
    hash-deterministic op here). Training stops early when the best
    remaining pair occurs fewer than ``min_pair_count`` times."""
    spark = docs.sparkSession
    syms = _word_types(docs, text_col).select(
        F.concat(
            F.split(F.col("w"), ""), F.array(F.lit(END))
        ).alias("s"),
        "n",
    ).localCheckpoint(eager=True)

    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(num_merges):
        pairs = (
            syms.filter(F.size("s") >= 2)
            .select(
                F.explode(
                    F.zip_with(
                        F.slice(F.col("s"), 1, F.size("s") - 1),
                        F.slice(F.col("s"), 2, F.size("s") - 1),
                        lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                    )
                ).alias("p"),
                "n",
            )
            .groupBy("p.l", "p.r")
            .agg(F.sum("n").alias("cnt"))
        )
        best = pairs.orderBy(F.desc("cnt"), "l", "r").limit(1).collect()
        if not best or best[0]["cnt"] < min_pair_count:
            break
        left, right, cnt = best[0]["l"], best[0]["r"], int(best[0]["cnt"])
        merges.append((rank, left, right, left + right, cnt))
        syms = syms.select(
            _merge_pair_expr(F.col("s"), left, right).alias("s"), "n"
        ).localCheckpoint(eager=True)

    return spark.createDataFrame(
        merges, "rank int, left string, right string, merged string, n_pair long"
    )


def _make_bpe_apply(merge_list: list):
    """Factory for the worker-side encode kernel (by-value closure)."""

    def apply_word(word: str, cache: dict) -> list:
        hit = cache.get(word)
        if hit is not None:
            return hit
        syms = list(word) + [END]
        for left, right, merged in merge_list:
            i, out = 0, []
            n = len(syms)
            while i < n:
                if i + 1 < n and syms[i] == left and syms[i + 1] == right:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
            if len(syms) == 1:
                break
        cache[word] = syms
        return syms

    def run(it):
        import pandas as pd

        cache: dict = {}
        for pdf in it:
            ids, toks, counts = [], [], []
            for doc_id, t in zip(pdf["doc_id"], pdf["text"]):
                text = t if isinstance(t, str) else ""
                words = [w for w in text.lower().split(" ") if w]
                seq: list = []
                for w in words:
                    seq.extend(apply_word(w, cache))
                ids.append(doc_id)
                toks.append(seq)
                counts.append(len(seq))
            yield pd.DataFrame(
                {"doc_id": ids, "n_tokens": counts, "tokens": toks}
            )

    return run


def bpe_encode(
    docs: DataFrame,
    merges: DataFrame | list,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Tokenize the corpus with a learned merge table: (doc_id,
    n_tokens, tokens). ``merges`` is the ``bpe_train`` output (or an
    already-collected [(left, right, merged)] list). The merge table is
    bounded by num_merges — collecting it is the broadcast-side
    materialization pattern, never corpus data. Merges apply in rank
    order with the SAME greedy left-to-right pass as training
    (invariant-tested), so encoding the training corpus reproduces the
    trained symbol table exactly. Detokenization invariant:
    ``concat(tokens)`` with the end markers restored as spaces equals
    the lowercased, space-normalized input."""
    if isinstance(merges, DataFrame):
        rows = merges.orderBy("rank").collect()
        merge_list = [(r["left"], r["right"], r["merged"]) for r in rows]
    else:
        merge_list = list(merges)
    fn = _make_bpe_apply(merge_list)
    return docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    ).mapInPandas(fn, "doc_id long, n_tokens long, tokens array<string>")


def _bpe_round_ctes(num_merges: int, min_pair_count: int) -> str:
    """The shared CTE chain for the BPE oracles: word types → initial
    symbol lists → ``num_merges`` unrolled (pair-count → argmax →
    conditional greedy merge) rounds — the ``pagerank_sql`` idiom
    applied to the one remaining iterative trainer (r12: retires the
    catalog's last rows-only entries).

    The greedy left-to-right merge replays as a ``list_reduce`` over a
    chr(31)-joined STRING accumulator (DuckDB's reduce seeds the
    accumulator with the first element — equivalent to the Spark fold's
    empty-init, since a lone first element always takes the append
    branch). U+001F is ASCII but NOT whitespace, so a corpus token CAN
    contain it and would corrupt the accumulator split — the s1 CTE
    therefore fail-louds via ``error()`` on any such token instead of
    silently diverging from the Spark trainer (the driver fixtures are
    printable-ASCII, so the guard is a tripwire, not a filter).
    Early stop replays WITHOUT a validity chain: a round whose
    best pair falls under ``min_pair_count`` leaves the symbol table
    frozen, so every later round recomputes the SAME sub-threshold best
    and stays invalid — exactly Spark's ``break``."""
    if num_merges > SQL_TESTED_MAX_MERGES:
        raise ValueError(
            f"bpe oracle: num_merges={num_merges} exceeds the tested bound "
            f"{SQL_TESTED_MAX_MERGES}. Each round adds ~3 MATERIALIZED CTEs; "
            "the chain is parity-tested up to the bound (tests/test_bpe.py), "
            "and WITHOUT the MATERIALIZED keyword the inlined form re-expands "
            "to 2^n scans (pinned as an fd-exhaustion crash at n=20). Audit "
            "the MATERIALIZED discipline and extend the parity test before "
            "raising the bound."
        )
    parts = [
        "w0 AS MATERIALIZED (SELECT w, count(*) AS n FROM ("
        "SELECT unnest(list_filter(string_split(lower(coalesce(text,'')), ' '), "
        "x -> x <> '')) AS w FROM documents) GROUP BY 1)",
        # U+001F guard: fail loud, never silently diverge (see docstring)
        "s1 AS MATERIALIZED (SELECT CASE WHEN contains(w, chr(31)) THEN "
        "error('bpe oracle: corpus token contains U+001F accumulator "
        "separator') ELSE w END AS w, "
        "list_append(list_transform(range(1, len(w)+1), "
        "i -> w[i:i]), '</w>') AS s, n FROM w0)",
    ]
    for k in range(1, num_merges + 1):
        parts.append(
            f"p{k} AS MATERIALIZED (SELECT pr[1] AS l, pr[2] AS r, "
            f"CAST(SUM(n) AS BIGINT) AS cnt FROM ("
            f"SELECT unnest(list_zip(s[1:len(s)-1], s[2:len(s)])) AS pr, n "
            f"FROM s{k}) GROUP BY 1, 2)"
        )
        parts.append(
            # ALWAYS exactly one row: with zero rows (every word fully
            # merged → no adjacent pairs anywhere) the downstream CROSS
            # JOIN would wipe the symbol table where Spark breaks —
            # LEFT JOIN ON TRUE + valid=FALSE freezes it instead
            f"b{k} AS MATERIALIZED (SELECT coalesce(t.l, '') AS l, "
            f"coalesce(t.r, '') AS r, "
            f"coalesce(t.l, '') || coalesce(t.r, '') AS merged, "
            f"coalesce(t.cnt, 0) AS cnt, "
            f"coalesce(t.cnt >= {min_pair_count}, FALSE) AS valid "
            f"FROM (SELECT 1 AS one) o LEFT JOIN "
            f"(SELECT l, r, cnt FROM p{k} ORDER BY cnt DESC, l, r LIMIT 1) t "
            f"ON TRUE)"
        )
        if k < num_merges:
            parts.append(
                f"s{k + 1} AS MATERIALIZED (SELECT w, CASE WHEN b{k}.valid THEN "
                f"string_split(list_reduce(s, (acc, x) -> "
                f"CASE WHEN string_split(acc, chr(31))[-1] = b{k}.l AND x = b{k}.r "
                f"THEN acc[1:len(acc) - len(string_split(acc, chr(31))[-1])] "
                f"|| b{k}.merged "
                f"ELSE acc || chr(31) || x END), chr(31)) "
                f"ELSE s END AS s, n FROM s{k} CROSS JOIN b{k})"
            )
    return ",\n".join(parts)


def bpe_train_sql(num_merges: int = 20, min_pair_count: int = 2) -> str:
    """DuckDB oracle for :func:`bpe_train` — (rank, left, right, merged,
    n_pair), invalid (post-break) rounds excluded."""
    body = _bpe_round_ctes(num_merges, min_pair_count)
    rows = " UNION ALL ".join(
        f'SELECT {k - 1} AS rank, l AS "left", r AS "right", merged, '
        f"cnt AS n_pair, valid FROM b{k}"
        for k in range(1, num_merges + 1)
    )
    return (
        f"WITH {body}\n"
        f'SELECT rank, "left", "right", merged, n_pair '
        f"FROM ({rows}) WHERE valid"
    )


def bpe_token_counts_sql(num_merges: int = 20, min_pair_count: int = 2) -> str:
    """DuckDB oracle for the ``bpe_token_counts`` entry — (doc_id,
    n_tokens): the fully-merged symbol table is already the chain's last
    state, one more conditional merge applies round ``num_merges``'s
    rule, then each doc sums its word occurrences' symbol counts (empty
    docs keep an explicit 0 via the LEFT JOIN)."""
    body = _bpe_round_ctes(num_merges, min_pair_count)
    k = num_merges
    return (
        f"WITH {body},\n"
        f"sfin AS MATERIALIZED (SELECT w, CASE WHEN b{k}.valid THEN "
        f"string_split(list_reduce(s, (acc, x) -> "
        f"CASE WHEN string_split(acc, chr(31))[-1] = b{k}.l AND x = b{k}.r "
        f"THEN acc[1:len(acc) - len(string_split(acc, chr(31))[-1])] "
        f"|| b{k}.merged "
        f"ELSE acc || chr(31) || x END), chr(31)) "
        f"ELSE s END AS s, n FROM s{k} CROSS JOIN b{k}),\n"
        f"dw AS (SELECT doc_id, unnest(list_filter("
        f"string_split(lower(coalesce(text,'')), ' '), x -> x <> '')) AS w "
        f"FROM documents)\n"
        f"SELECT d.doc_id, CAST(coalesce(SUM(len(f.s)), 0) AS BIGINT) AS n_tokens "
        f"FROM documents d LEFT JOIN dw ON d.doc_id = dw.doc_id "
        f"LEFT JOIN sfin f ON dw.w = f.w GROUP BY 1"
    )
