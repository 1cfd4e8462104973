"""Byte-pair-encoding tokenizer training and application (Sennrich et
al. 2016, "Neural Machine Translation of Rare Words with Subword
Units" — public method).

The reference NVTabular has no tokenizer surface (extension, like the
rest of the token-pipeline family); this module exists because a
100 TB training-data engine that packs/chunks/decontaminates token
sequences should also be able to PRODUCE them from raw text.

Design — aggregate first, then train (the same shape every public
trainer uses: HuggingFace ``tokenizers`` and SentencePiece both train
from a word-frequency table, not the raw corpus):

* **fit** — ONE corpus pass: pretokenize (shared ASCII-exact regex,
  see below) → explode → map-side-partial ``groupBy(word)`` →
  distributed top-``max_words`` by (count desc, word asc)
  (``orderBy().limit()`` compiles to TakeOrderedAndProject: per-
  partition heaps, no global sort). The capped (word, count) table —
  O(max_words), independent of corpus size — is collected and the
  classic merge loop runs driver-side with incremental pair-count
  updates: O(merges × affected-words), never touching the corpus
  again. At 100 TB the corpus cost is exactly the one word-count
  shuffle.
* **encode / decode** — stateless Arrow-batched pandas UDFs with a
  per-executor word→ids memo (web text is Zipfian: the hit rate is
  the corpus unique-word curve, so amortized cost per token is a dict
  probe). No shuffle; any partitioning works.

Pretokenization must be BIT-IDENTICAL between the Spark fit (Java
regex) and the Python encode path, so the pattern uses only ASCII
classes that the two engines interpret identically:
``[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n\\r]`` — letter runs, digit
runs, and single other characters (unicode letters become single-char
symbols). Word-end is marked by suffixing the final symbol with
``</w>`` (the classic formulation), so decode recovers word
boundaries exactly.

Determinism: merge ties break by (pair-count desc, pair lexicographic
asc); the vocabulary cut ties by (count desc, word asc); id layout is
``<pad>``=0, ``<unk>``=1, then the fit alphabet sorted, then merge
outputs in rank order — identical across runs, partitionings, and
cluster sizes.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType, StringType

#: shared fit/encode pretokenizer — ASCII classes only (see module doc)
WORD_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\r]"
_WORD_RE = re.compile(WORD_PATTERN)
EOW = "</w>"
PAD, UNK = "<pad>", "<unk>"


def pretokenize(col, lowercase: bool = True):
    """Spark-side word extraction with the shared pattern."""
    src = F.lower(col) if lowercase else col
    return F.regexp_extract_all(src, F.lit(f"({WORD_PATTERN})"), 1)


def _pretokenize_py(text: str, lowercase: bool) -> List[str]:
    if lowercase:
        text = text.lower()
    return _WORD_RE.findall(text)


def word_counts(df: DataFrame, text_col: str = "text",
                lowercase: bool = True) -> DataFrame:
    """(word, cnt) over the corpus — one map-side-partial groupBy."""
    return (df.select(F.explode(pretokenize(F.col(text_col), lowercase))
                      .alias("word"))
            .groupBy("word")
            .agg(F.count(F.lit(1)).cast("long").alias("cnt")))


def _word_symbols(word: str) -> Tuple[str, ...]:
    return tuple(word[:-1]) + (word[-1] + EOW,)


def _merge_word(sym: List[str], a: str, b: str, ab: str) -> List[str]:
    out, i, n = [], 0, len(sym)
    while i < n:
        if i + 1 < n and sym[i] == a and sym[i + 1] == b:
            out.append(ab)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return out


def _bpe_merges(counts: List[Tuple[str, int]], n_merges: int,
                min_pair_count: int) -> Tuple[List[Tuple[str, str]],
                                              List[str]]:
    """Classic BPE over a (word, count) table with incremental
    pair-count maintenance. Returns (ranked merges, sorted alphabet).
    """
    words = [(list(_word_symbols(w)), c) for w, c in counts if w]
    alphabet = sorted({s for sym, _ in words for s in sym})
    pair_counts: Dict[Tuple[str, str], int] = {}
    pair_words: Dict[Tuple[str, str], set] = {}
    for wi, (sym, c) in enumerate(words):
        for p in zip(sym, sym[1:]):
            pair_counts[p] = pair_counts.get(p, 0) + c
            pair_words.setdefault(p, set()).add(wi)
    merges: List[Tuple[str, str]] = []
    while len(merges) < n_merges and pair_counts:
        # count desc, pair asc — deterministic under any dict order
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_counts[best] < min_pair_count:
            break
        a, b = best
        ab = a + b
        for wi in list(pair_words.get(best, ())):
            sym, c = words[wi]
            for p in zip(sym, sym[1:]):
                pair_counts[p] -= c
                if pair_counts[p] <= 0:
                    del pair_counts[p]
                s = pair_words.get(p)
                if s is not None:
                    s.discard(wi)
                    if not s:
                        del pair_words[p]
            sym = _merge_word(sym, a, b, ab)
            words[wi] = (sym, c)
            for p in zip(sym, sym[1:]):
                pair_counts[p] = pair_counts.get(p, 0) + c
                pair_words.setdefault(p, set()).add(wi)
        merges.append((a, b))
    return merges, alphabet


@dataclass
class BPEModel:
    """Fitted tokenizer: ranked merges + id layout (see module doc).
    O(vocab) driver-side state; broadcast implicitly via UDF closure.
    """
    merges: List[Tuple[str, str]]
    alphabet: List[str]
    lowercase: bool = True
    vocab: Dict[str, int] = field(init=False)

    def __post_init__(self):
        v = {PAD: 0, UNK: 1}
        for s in self.alphabet:
            v.setdefault(s, len(v))
        for a, b in self.merges:
            v.setdefault(a + b, len(v))
        self.vocab = v

    @property
    def vocab_size(self) -> int:
        return len(self.vocab)

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump({"merges": [list(m) for m in self.merges],
                       "alphabet": self.alphabet,
                       "lowercase": self.lowercase}, f)

    @classmethod
    def load(cls, path: str) -> "BPEModel":
        with open(path) as f:
            d = json.load(f)
        return cls(merges=[tuple(m) for m in d["merges"]],
                   alphabet=list(d["alphabet"]),
                   lowercase=bool(d["lowercase"]))

    # -- python-side word encoding (used inside the Arrow UDF) --
    def encode_word(self, word: str,
                    ranks: Optional[Dict[Tuple[str, str], int]] = None
                    ) -> List[int]:
        if ranks is None:
            ranks = {m: i for i, m in enumerate(self.merges)}
        sym = list(_word_symbols(word))
        while len(sym) > 1:
            best_rank, best_i = None, -1
            for i, p in enumerate(zip(sym, sym[1:])):
                r = ranks.get(p)
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_rank is None:
                break
            a, b = sym[best_i], sym[best_i + 1]
            sym = _merge_word(sym, a, b, a + b)
        unk = self.vocab[UNK]
        return [self.vocab.get(s, unk) for s in sym]


def bpe_fit(df: DataFrame, text_col: str = "text",
            n_merges: int = 10_000, max_words: int = 1_000_000,
            min_pair_count: int = 2, lowercase: bool = True) -> BPEModel:
    """Train BPE merges on a corpus: one word-count pass + driver-side
    merge loop over the capped aggregate (see module doc for the cost
    model). ``max_words`` bounds driver memory — the retained head of
    a Zipfian word distribution carries almost all pair mass, which is
    exactly the approximation public trainers make when they cap or
    prune the word table."""
    wc = word_counts(df, text_col, lowercase)
    top = (wc.orderBy(F.col("cnt").desc(), F.col("word").asc())
           .limit(max_words))
    rows = [(r["word"], int(r["cnt"])) for r in top.collect()]
    if not rows:
        raise ValueError("bpe_fit: corpus has no words")
    merges, alphabet = _bpe_merges(rows, n_merges, min_pair_count)
    return BPEModel(merges=merges, alphabet=alphabet, lowercase=lowercase)


def bpe_encode(df: DataFrame, model: BPEModel, text_col: str = "text",
               out_col: str = "tokens", n_tok_col: Optional[str] = "n_tok",
               memo_cap: int = 1 << 20) -> DataFrame:
    """Add ``out_col: array<int>`` (+ ``n_tok_col: int`` unless None) —
    Arrow-batched, no shuffle; null text stays null. The per-executor
    word→ids memo is capped at ``memo_cap`` entries (reset when full)
    so a pathological all-unique corpus cannot grow executor memory
    unboundedly."""
    ranks = {m: i for i, m in enumerate(model.merges)}
    lowercase = model.lowercase
    memo: Dict[str, List[int]] = {}

    @F.pandas_udf(ArrayType(IntegerType()))
    def enc(texts):
        import pandas as pd

        def one(t):
            if t is None:
                return None
            ids: List[int] = []
            for w in _pretokenize_py(t, lowercase):
                got = memo.get(w)
                if got is None:
                    if len(memo) >= memo_cap:
                        memo.clear()
                    got = memo[w] = model.encode_word(w, ranks)
                ids.extend(got)
            return ids
        return pd.Series([one(t) for t in texts])

    out = df.withColumn(out_col, enc(F.col(text_col)))
    if n_tok_col is None:
        return out
    return out.withColumn(
        n_tok_col, F.coalesce(F.size(out_col), F.lit(0)).cast("int"))


def bpe_decode(df: DataFrame, model: BPEModel,
               tokens_col: str = "tokens",
               out_col: str = "text_decoded") -> DataFrame:
    """Inverse of :func:`bpe_encode` for inspection/round-trip tests:
    ids → symbols, ``</w>`` → word boundary (single space). Arrow-
    batched; null arrays stay null."""
    id_to_sym = {i: s for s, i in model.vocab.items()}

    @F.pandas_udf(StringType())
    def dec(tok_lists):
        import pandas as pd

        def one(ids):
            if ids is None:
                return None
            text = "".join(id_to_sym.get(int(i), UNK) for i in ids)
            return text.replace(EOW, " ").rstrip(" ")
        return pd.Series([one(ids) for ids in tok_lists])

    return df.withColumn(out_col, dec(F.col(tokens_col)))
