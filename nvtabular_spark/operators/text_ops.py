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
from .base import Operator, TransformContext


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
