"""BPE tokenizer induction over a corpus — the step between curation
and training that turns the cleaned text into the vocabulary the model
will actually be tokenized with.

Three phases, each with the scale shape real trainers use
(SentencePiece / HF tokenizers train on a word->count dictionary, not
the raw corpus — that dictionary is the ONLY corpus-sized computation):

1. `word_frequencies` — ONE map-side-combinable shuffle producing the
   per-word count table, cut to a deterministic top-K (TakeOrdered, no
   global window). Heavy-tailed text makes top-100k words cover
   ~99.9% of token mass, so the cut loses almost nothing while
   bounding everything downstream.
2. `bpe_train` — the classic Sennrich et al. (arXiv:1508.07909) merge
   loop over that BOUNDED dictionary on the driver: incremental
   pair-count maintenance (only words containing the merged pair are
   touched), deterministic ties (count desc, then pair lexicographic).
   Cost is O(top_k * word_len) per merge, independent of corpus size.
3. `bpe_encode` — distributed application of the learned merges:
   Arrow-batched mapInPandas with a per-batch word memo (web text
   repeats words massively, so encoding cost ~ unique words per
   batch, not tokens). The merge table is vocab-bounded by
   construction, so shipping it in the closure is the legitimate
   dimension-broadcast, unlike the corpus vocabulary (see
   quality.unigram_logprob's scale note).

No reference-counterpart: the reference engine (blq-cli) has no
tokenizer surface; this extends the training-data family
(SURVEY.md §2.12 additions) the same way selection.py (DSIR) does.
"""

from __future__ import annotations

import json
from collections import Counter, defaultdict
from collections.abc import Iterator, Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from blq_cli_spark.operators.text import tokens

END = "</w>"  # Sennrich end-of-word marker: merges never cross words


def word_frequencies(
    docs: DataFrame,
    text_col: str = "text",
    top_k: int = 100_000,
) -> DataFrame:
    """(word, n) for the `top_k` most frequent whitespace words,
    deterministic tie-break (count desc, word asc).

    Scale shape: explode -> groupBy(word) is one shuffle with map-side
    partial aggregation; the top-K cut is orderBy+limit =
    TakeOrderedAndProject (per-partition heaps + driver merge of K
    rows), never a global sort or single-partition window. Output is
    bounded by construction -> safe to collect/broadcast."""
    return (
        docs.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(int(top_k))
    )


def bpe_train(
    word_counts: Sequence[tuple[str, int]],
    n_merges: int = 1000,
) -> list[tuple[str, str]]:
    """Classic BPE merge learning over a (word, count) dictionary.

    Pure driver-side Python over the BOUNDED dictionary (pair counts
    maintained incrementally: each merge touches only the words that
    contain the pair, via a pair->word index). Deterministic: ties on
    pair count break lexicographically, so the same dictionary yields
    the same merge list on any host.

    Returns the ordered merge list [(left, right), ...] — earlier =
    higher priority, exactly the artifact tokenizer files ship."""
    seqs: dict[int, list[str]] = {}
    counts: dict[int, int] = {}
    for i, (w, c) in enumerate(word_counts):
        if not w:
            continue
        seqs[i] = list(w) + [END]
        counts[i] = int(c)

    pair_counts: Counter = Counter()
    pair_words: defaultdict[tuple[str, str], set[int]] = defaultdict(set)
    for i, s in seqs.items():
        c = counts[i]
        for a, b in zip(s, s[1:]):
            pair_counts[(a, b)] += c
            pair_words[(a, b)].add(i)

    merges: list[tuple[str, str]] = []
    for _ in range(int(n_merges)):
        candidates = [(c, p) for p, c in pair_counts.items() if c > 0]
        if not candidates:
            break
        pair = min(candidates, key=lambda cp: (-cp[0], cp[1]))[1]
        merges.append(pair)
        merged = pair[0] + pair[1]
        for i in list(pair_words[pair]):
            s, c = seqs[i], counts[i]
            # remove this word's contribution, apply the merge, re-add
            for a, b in zip(s, s[1:]):
                pair_counts[(a, b)] -= c
                pair_words[(a, b)].discard(i)
            j, out = 0, []
            while j < len(s):
                if j < len(s) - 1 and s[j] == pair[0] and s[j + 1] == pair[1]:
                    out.append(merged)
                    j += 2
                else:
                    out.append(s[j])
                    j += 1
            seqs[i] = out
            for a, b in zip(out, out[1:]):
                pair_counts[(a, b)] += c
                pair_words[(a, b)].add(i)
        pair_counts.pop(pair, None)
        pair_words.pop(pair, None)
    return merges


def train_tokenizer(
    docs: DataFrame,
    n_merges: int = 1000,
    top_k_words: int = 100_000,
    text_col: str = "text",
) -> list[tuple[str, str]]:
    """End-to-end induction: one corpus shuffle for the word dictionary
    (word_frequencies), then the bounded driver merge loop (bpe_train).
    The collect is the deliberately bounded top-K table, never the
    corpus."""
    wc = [
        (r["word"], r["n"])
        for r in word_frequencies(docs, text_col=text_col, top_k=top_k_words).collect()
    ]
    return bpe_train(wc, n_merges=n_merges)


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank-first BPE encoding of one word (the exact
    inference rule BPE tokenizers apply)."""
    s = list(word) + [END]
    while len(s) > 1:
        best_rank, best_idx = None, None
        for j, p in enumerate(zip(s, s[1:])):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_idx = r, j
        if best_idx is None:
            break
        s[best_idx : best_idx + 2] = [s[best_idx] + s[best_idx + 1]]
    return s


def bpe_encode(
    docs: DataFrame,
    merges: Sequence[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    with_tokens: bool = False,
) -> DataFrame:
    """Distributed BPE encoding with a learned merge list: returns
    (id_col, n_words, n_bpe_tokens[, bpe_tokens]).

    Scale shape: Arrow-batched mapInPandas (never row-at-a-time); the
    merge table is vocab-bounded (ships in the task closure — the
    legitimate dimension broadcast); a per-batch word memo makes the
    cost proportional to DISTINCT words per batch, which heavy-tailed
    text keeps tiny relative to token count. One linear pass, no
    shuffle."""
    import pandas as pd

    ranks = {tuple(p): i for i, p in enumerate(merges)}
    want_tokens = bool(with_tokens)
    fields = f"`{id_col}` {dict(docs.dtypes)[id_col]}, n_words long, n_bpe_tokens long"
    if want_tokens:
        fields += ", bpe_tokens array<string>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, list[str]] = {}

        def enc(word: str) -> list[str]:
            got = memo.get(word)
            if got is None:
                got = memo[word] = encode_word(word, ranks)
            return got

        for pdf in batches:
            ids, nw, nt, toks = [], [], [], []
            for i, text in zip(pdf[id_col], pdf[text_col]):
                words = text.split() if isinstance(text, str) else []
                pieces: list[str] = []
                for w in words:
                    pieces.extend(enc(w))
                ids.append(i)
                nw.append(len(words))
                nt.append(len(pieces))
                if want_tokens:
                    toks.append(pieces)
            out = {id_col: ids, "n_words": nw, "n_bpe_tokens": nt}
            if want_tokens:
                out["bpe_tokens"] = toks
            yield pd.DataFrame(out)

    return docs.select(id_col, text_col).mapInPandas(run, schema=fields)


def bpe_fertility(
    docs: DataFrame,
    merges: Sequence[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
) -> DataFrame:
    """tokenizer_fertility with the LEARNED vocabulary instead of the
    regex proxy: subword tokens per word, per language — the measured
    sequence cost a candidate vocabulary imposes on each language
    (the number that decides whether the training mix the vocab was
    fitted on under-serves a language).

    One encode pass + one groupBy on the dimension-sized lang key."""
    enc = bpe_encode(docs, merges, text_col=text_col, id_col=id_col)
    langs = docs.select(
        F.col(id_col), F.col(lang_col).cast("string").alias("lang")
    )
    return (
        enc.join(langs, id_col)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").alias("n_words"),
            F.sum("n_bpe_tokens").alias("n_subwords"),
        )
        .withColumn(
            "fertility",
            F.round(
                F.col("n_subwords") / F.greatest(F.col("n_words"), F.lit(1)), 6
            ),
        )
    )


def save_merges(merges: Sequence[tuple[str, str]], path: str) -> None:
    with open(path, "w") as f:
        json.dump([list(p) for p in merges], f)


def load_merges(path: str) -> list[tuple[str, str]]:
    with open(path) as f:
        return [tuple(p) for p in json.load(f)]
