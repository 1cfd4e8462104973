"""Workflow-first wrappers over the text-quality column functions
(functions/text.py), so curation signals compose in the op DAG exactly
like the reference's feature ops (`["text"] >> ops.ScrubPII()` etc.).

No reference analog (NVTabular has no text surface) — these are part
of the LLM-pipeline extension family (SURVEY §2.11). All are pure
codegen expressions; the heavy lifting lives in functions/text.py and
is oracle-gated there (`pii_scrub`, `text_stats`, `text_repetition`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import text
from .base import Operator, StatOperator, TransformContext


class ScrubPII(Operator):
    """Replace URL / email / IPv4 occurrences with placeholder tokens
    in each selected text column (functions/text.py::scrub_pii)."""

    preserves_dtype = True  # string in, string out

    def __init__(self, kinds=("url", "email", "ipv4")):
        self.kinds = list(kinds)

    def expr(self, col: Column, name: str, df: DataFrame,
             ctx: TransformContext) -> Column:
        return text.scrub_pii(col, tuple(self.kinds))

    def output_tags(self):
        return ["text"]


class TokenCount(Operator):
    """Whitespace (or BPE-ish regex) token count per text column,
    emitted as ``<col>_n_tok`` (functions/text.py::token_count)."""

    out_dtype = "int"

    def __init__(self, bpe_ish: bool = False, postfix: str = "_n_tok"):
        self.bpe_ish = bool(bpe_ish)
        self.postfix = postfix

    def output_column_names(self, selector):
        return [f"{c}{self.postfix}" for c in selector.names]

    def expr(self, col: Column, name: str, df: DataFrame,
             ctx: TransformContext) -> Column:
        fn = text.bpe_ish_token_count if self.bpe_ish else text.token_count
        return fn(col).cast("int")

    def output_tags(self):
        return ["continuous"]


class LangId(Operator):
    """Stopword-heuristic language id per text column, emitted as
    ``<col>_lang``."""

    out_dtype = "string"

    def __init__(self, default: str = "en", postfix: str = "_lang"):
        self.default = default
        self.postfix = postfix

    def output_column_names(self, selector):
        return [f"{c}{self.postfix}" for c in selector.names]

    def expr(self, col: Column, name: str, df: DataFrame,
             ctx: TransformContext) -> Column:
        return text.lang_id(col, self.default)

    def output_tags(self):
        return ["categorical"]


class QualityScore(Operator):
    """[0, 1] heuristic quality score per text column, emitted as
    ``<col>_quality``."""

    out_dtype = "double"

    def __init__(self, postfix: str = "_quality"):
        self.postfix = postfix

    def output_column_names(self, selector):
        return [f"{c}{self.postfix}" for c in selector.names]

    def expr(self, col: Column, name: str, df: DataFrame,
             ctx: TransformContext) -> Column:
        return text.quality_score(col)

    def output_tags(self):
        return ["continuous"]


class BPETokenize(StatOperator):
    """Fitted tokenizer op: ``fit`` trains BPE merges on the union of
    the selected text columns (ONE word-count pass over the corpus —
    functions/bpe.py holds the trainer and the cost model); ``transform``
    emits ``<col>_tokens: array<int>`` per column via the Arrow-batched
    encoder. The fitted model is JSON-safe state (ranked merges +
    alphabet), so Workflow save/load round-trips it like any other
    stat — a saved curation workflow carries its tokenizer.

    No reference analog (NVTabular consumes pre-tokenized data); this
    is the op that PRODUCES the north-rule (doc_id, tokens, n_tok)
    table from raw text inside the same DAG that cleans it.
    """

    out_dtype = "array<int>"

    def __init__(self, n_merges: int = 10_000, max_words: int = 1_000_000,
                 min_pair_count: int = 2, lowercase: bool = True,
                 postfix: str = "_tokens"):
        super().__init__()
        self.n_merges = int(n_merges)
        self.max_words = int(max_words)
        self.min_pair_count = int(min_pair_count)
        self.lowercase = bool(lowercase)
        self.postfix = postfix
        self._model = None

    def output_column_names(self, selector):
        return [f"{c}{self.postfix}" for c in selector.names]

    def fit(self, ctx: TransformContext, df: DataFrame) -> None:
        from ..functions import bpe as bpe_mod
        acts = [act for _, act in ctx.pairs()]
        # one shared vocabulary across the selected columns: stack them
        # into a single text column (columns-as-rows union keeps the
        # word-count pass at ONE job regardless of selector width)
        stacked = df.select(
            F.explode(F.array(*[F.col(a).cast("string") for a in acts]))
            .alias("text"))
        self._model = bpe_mod.bpe_fit(
            stacked, text_col="text", n_merges=self.n_merges,
            max_words=self.max_words, min_pair_count=self.min_pair_count,
            lowercase=self.lowercase)
        self.fitted = True

    @property
    def model(self):
        self._require_fitted()
        return self._model

    def transform(self, ctx: TransformContext, df: DataFrame) -> DataFrame:
        self._require_fitted()
        from ..functions import bpe as bpe_mod
        for pub, act in ctx.pairs():
            df = bpe_mod.bpe_encode(df, self._model, text_col=act,
                                    out_col=ctx.out(f"{pub}{self.postfix}"),
                                    n_tok_col=None)
        return df

    def save_state(self):
        m = self.model
        return {"merges": [list(p) for p in m.merges],
                "alphabet": list(m.alphabet)}

    def load_state(self, state):
        from ..functions import bpe as bpe_mod
        self._model = bpe_mod.BPEModel(
            merges=[tuple(p) for p in state["merges"]],
            alphabet=list(state["alphabet"]), lowercase=self.lowercase)
        self.fitted = True

    def clear(self):
        super().clear()
        self._model = None

    def output_tags(self):
        return ["tokens"]
