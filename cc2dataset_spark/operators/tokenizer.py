"""Distributed BPE tokenizer training (scale extension; no reference
twin — tokenizer fitting is the step a training-data pipeline runs
right after curation, on the same corpus the engine just built).

Implements byte-pair-encoding merge learning (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units", §3.2)
over a word-frequency DataFrame. The algorithm is inherently
sequential in the merge list (merge t+1 depends on the vocabulary
after merge t — the same driver-side loop every BPE trainer runs),
but each iteration's work is a Spark job over the DISTINCT-word
segmentation table, which is corpus-size-INDEPENDENT (Heaps' law):

- pair counting: one explode of adjacent symbol pairs per distinct
  word, weighted by word frequency, into a partial hash aggregate
  (alphabet^2-bounded keys after few merges, vocabulary-bounded
  always);
- argmax: orderBy(count desc, pair).limit(1) — a
  TakeOrderedAndProject, collecting ONE row per iteration (a bounded
  driver action, same class as the IVF codebook fits);
- merge application: a JVM aggregate() fold over each word's symbol
  array — left-to-right non-overlapping replacement, exactly the
  reference algorithm's scan — no Python in the per-word path.

The corpus-scale stage happens ONCE, outside this module: building
the word-frequency table (one word-keyed, map-side-combined count —
the text_bpe_pair_counts plan). Everything here rides the distinct
vocabulary.

`bpe_segment` is the APPLY side: encode words with a learned merge
list by repeatedly merging the lowest-rank adjacent pair (the
standard encoder loop), as an Arrow-batched mapInPandas kernel over
the distinct words — O(len * n_applied_merges) per word, vocabulary-
scale, and joinable back to the corpus by word.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as ST


def _chars(col: str) -> Column:
    return F.filter(F.split(F.col(col), ""), lambda x: x != "")


def _apply_merge(sym_col: str, a: str, b: str) -> Column:
    """Left-to-right non-overlapping replacement of adjacent (a, b)
    with a+b over a symbol array — one aggregate() fold, evaluated
    once per word per iteration (JVM, no UDF). The fold naturally
    implements the non-overlap rule: after 'aa' merges in 'aaa', the
    new last symbol is 'aa', so the next 'a' cannot pair again."""
    a_c, b_c, ab_c = F.lit(a), F.lit(b), F.lit(a + b)
    return F.aggregate(
        sym_col,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == a_c)
            & (x == b_c),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(ab_c)
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def _learn_bpe_in_memory(
    vocab: list[tuple[str, int]], k: int
) -> list[tuple[str, str]]:
    """Classic driver-side BPE trainer over a collected vocabulary —
    EXACTLY the distributed loop's semantics: pair counts weighted by
    word frequency, argmax by (count desc, left, right), left-to-right
    non-overlapping merge application, early stop when no pair
    remains. Ordering parity: Python str comparison is by code point
    and Spark's UTF8String comparison is by UTF-8 bytes — identical
    orders, because UTF-8 preserves code-point order."""
    segs: list[tuple[list[str], int]] = [
        (list(w), int(c)) for w, c in vocab
    ]
    merges: list[tuple[str, str]] = []
    for _ in range(k):
        counts: dict[tuple[str, str], int] = {}
        for syms, c in segs:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + c
        if not counts:
            break
        (a, b) = min(counts, key=lambda p: (-counts[p], p[0], p[1]))
        merges.append((a, b))
        for idx, (syms, c) in enumerate(segs):
            if len(syms) < 2:
                continue
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == a
                    and syms[i + 1] == b
                ):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            segs[idx] = (out, c)
    return merges


def learn_bpe_merges(
    wf: DataFrame,
    k: int,
    word_col: str = "w",
    count_col: str = "c",
    collect_threshold: int = 2_000_000,
) -> list[tuple[str, str]]:
    """Learn up to ``k`` BPE merge rules from a word-frequency frame.

    Ties break deterministically by (count desc, left, right) so the
    learned tokenizer is reproducible across partitionings and
    engines. Stops early (returns fewer than k) when no adjacent pair
    remains.

    **Bounded-vocab fast path**: when the distinct vocabulary fits
    ``collect_threshold`` rows (it essentially always does — Heaps'
    law puts even a 100 TB corpus's distinct-word table in the low
    millions, and this is the SAME bounded-collect class as the IVF
    codebook fits), the vocabulary is collected ONCE and the classic
    in-memory trainer runs on the driver — because the distributed
    loop costs k sequential Spark jobs (a real 32k-merge vocabulary
    would be 32k job launches, pure scheduling overhead on
    vocabulary-scale data). Set ``collect_threshold=0`` to force the
    distributed loop (it remains the scale escape hatch AND the
    equality reference — tests assert both paths learn identical
    merge lists). One caveat guards exactness: Spark's split("")
    segments by UTF-16 code unit while Python segments by code
    point, so a vocabulary containing astral-plane characters
    (beyond U+FFFF) falls back to the distributed loop rather than
    risk divergent initial segmentations.

    Distributed loop: each iteration persists the new segmentation
    and releases the previous one, so lineage stays one fold deep and
    driver memory holds only the merge list."""
    if k < 0:
        raise ValueError(f"k must be >= 0, got {k}")
    # Null words/counts are refused LOUDLY and identically on both
    # paths (ADVICE r10): the in-memory trainer would otherwise die
    # with a bare TypeError while the distributed loop silently
    # dropped the row (null segmentation filtered by size(s) >= 2) —
    # two different answers on the same dirty input. The distributed
    # guard is a lazily evaluated raise_error branch on the count
    # column (the fit_pca pattern): zero extra passes, fails the scan
    # at the first offending row.
    null_msg = (
        "learn_bpe_merges: null word or count in word-frequency frame"
    )
    if collect_threshold > 0:
        pruned = wf.select(
            F.col(word_col).cast("string").alias("w"),
            F.col(count_col).cast("bigint").alias("c"),
        )
        # limit(threshold + 1): one cheap bounded probe instead of a
        # full count when the vocabulary is huge
        probe = pruned.limit(collect_threshold + 1).collect()
        if len(probe) <= collect_threshold:
            vocab = [(r["w"], r["c"]) for r in probe]
            if any(w is None or c is None for w, c in vocab):
                raise ValueError(null_msg)
            if all(ord(ch) <= 0xFFFF for w, _ in vocab for ch in w):
                return _learn_bpe_in_memory(vocab, k)
    from pyspark.storagelevel import StorageLevel

    guarded_c = (
        F.when(
            F.col(word_col).isNull() | F.col(count_col).isNull(),
            F.raise_error(F.lit(null_msg)),
        )
        .otherwise(F.col(count_col))
        .cast("bigint")
    )
    seg = wf.select(
        guarded_c.alias("c"),
        _chars(word_col).alias("s"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    merges: list[tuple[str, str]] = []
    try:
        for _ in range(k):
            pairs = seg.where(F.size("s") >= 2).select(
                "c",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(s) - 1), "
                        "i -> struct(element_at(s, i) AS a, "
                        "element_at(s, i + 1) AS b))"
                    )
                ).alias("p"),
            )
            best = (
                pairs.groupBy("p.a", "p.b")
                .agg(F.sum("c").alias("cnt"))
                .orderBy(F.desc("cnt"), "a", "b")
                .limit(1)
                .collect()
            )
            if not best:
                break
            a, b = best[0]["a"], best[0]["b"]
            merges.append((a, b))
            new_seg = seg.select(
                "c", _apply_merge("s", a, b).alias("s")
            ).persist(StorageLevel.MEMORY_AND_DISK)
            new_seg.count()  # materialize before dropping the parent
            seg.unpersist()
            seg = new_seg
    except Exception as e:  # surface the guard as the documented type
        if null_msg in str(e):
            raise ValueError(null_msg) from e
        raise
    finally:
        seg.unpersist()
    return merges


def bpe_segment(
    words: DataFrame,
    merges: list[tuple[str, str]],
    word_col: str = "w",
    out_col: str = "pieces",
) -> DataFrame:
    """Encode each word with a learned merge list: repeatedly merge
    the adjacent pair with the LOWEST merge rank until none applies —
    the standard BPE encoder. Arrow-batched mapInPandas kernel (the
    encoder's data-dependent while-loop has no JVM expression form);
    run it over DISTINCT words and join back to the corpus by word,
    so the kernel cost is vocabulary-scale."""
    ranks = {pair: r for r, pair in enumerate(merges)}
    out_fields = list(words.schema.fields) + [
        ST.StructField(out_col, ST.ArrayType(ST.StringType()))
    ]
    schema = ST.StructType(out_fields)

    def encode(batches: Iterator) -> Iterator:
        def enc(w: str) -> list[str]:
            syms = list(w)
            while len(syms) >= 2:
                cand = [
                    (ranks[p], i)
                    for i, p in enumerate(zip(syms, syms[1:]))
                    if p in ranks
                ]
                if not cand:
                    break
                r, _ = min(cand)
                a, b = merges[r]
                out, i = [], 0
                while i < len(syms):
                    if (
                        i + 1 < len(syms)
                        and syms[i] == a
                        and syms[i + 1] == b
                    ):
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            return syms

        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = [enc(w) for w in pdf[word_col]]
            yield pdf

    return words.mapInPandas(encode, schema)
