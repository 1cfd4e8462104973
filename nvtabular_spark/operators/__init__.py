"""Operator library — full inventory per SURVEY.md §2."""

from .base import Operator, StatOperator, TransformContext
# reference parity: nvtabular.ops re-exports ColumnSelector
# (/root/reference/nvtabular/ops/__init__.py:17)
from ..plans.graph import ColumnSelector
from .categorify import Categorify, embedding_size, get_embedding_sizes
from .column_similarity import ColumnSimilarity
from .data_stats import DataStats
from .difference_lag import DifferenceLag
from .fill import FillMedian, FillMissing
from .groupby import Groupby
from .hash_ops import HashBucket, HashedCross
from .joins import JoinExternal, JoinGroupby
from .lambdaop import LambdaOp
from .list_ops import ListSlice, ValueCount
from .math_ops import Bucketize, Clip, LogOp, QuantileBin
from .normalize import Normalize, NormalizeMinMax
from .rowops import (AddMetadata, AddProperties, AddTags, DropLowCardinality,
                     Dropna, Filter, ReduceDtypeSize, Rename, TagAsItemFeatures,
                     TagAsItemID, TagAsUserFeatures, TagAsUserID)
from .target_encoding import TargetEncoding, WoEEncoding
from .text_ops import (BPETokenize, LangId, QualityScore, ScrubPII,
                       TokenCount)
from .temporal import (AsOfJoin, ExpandingTargetEncoding, Lag, Lead, RollingAgg,
                       RollingBackfill, TimeDecay, Sessionize)
# named sub-DAG boundary (reference merlin.dag.ops.subgraph.Subgraph)
from ..plans.graph import Subgraph

__all__ = [
    "Operator", "StatOperator", "TransformContext",
    "Categorify", "embedding_size", "get_embedding_sizes",
    "ColumnSimilarity", "DataStats", "DifferenceLag",
    "FillMedian", "FillMissing", "Groupby", "HashBucket", "HashedCross",
    "JoinExternal", "JoinGroupby", "LambdaOp", "ListSlice", "ValueCount",
    "ScrubPII", "TokenCount", "LangId", "QualityScore", "BPETokenize",
    "Bucketize", "Clip", "LogOp", "QuantileBin", "Normalize", "NormalizeMinMax",
    "AddMetadata", "AddProperties", "AddTags", "DropLowCardinality",
    "Dropna", "Filter", "ReduceDtypeSize", "Rename",
    "TagAsItemFeatures", "TagAsItemID", "TagAsUserFeatures", "TagAsUserID",
    "TargetEncoding", "WoEEncoding",
    "AsOfJoin", "ExpandingTargetEncoding", "Lag", "Lead", "RollingAgg",
    "RollingBackfill", "TimeDecay", "Sessionize",
    "Subgraph",
]
