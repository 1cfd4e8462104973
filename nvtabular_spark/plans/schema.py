"""Sidecar schema: tags + properties per column.

The reference tracks tags (CATEGORICAL/CONTINUOUS/...), embedding sizes,
vocab paths and ragged-shape info alongside dtypes
(workflow.py:125-163, categorify.py:555-583). Spark's StructType has no
tag slot, so we keep a parallel dict, serialized with the workflow.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Set


class Tags:
    CATEGORICAL = "categorical"
    CONTINUOUS = "continuous"
    LIST = "list"
    USER = "user"
    ITEM = "item"
    USER_ID = "user_id"
    ITEM_ID = "item_id"
    TARGET = "target"
    TEXT = "text"
    EMBEDDING = "embedding"
    BINARY = "binary"


class ColumnSchema:
    def __init__(self, name: str, dtype: Optional[str] = None,
                 tags: Optional[Set[str]] = None,
                 properties: Optional[dict] = None):
        self.name = name
        self.dtype = dtype
        self.tags: Set[str] = set(tags or ())
        self.properties: dict = dict(properties or {})

    def copy(self) -> "ColumnSchema":
        return ColumnSchema(self.name, self.dtype, set(self.tags),
                            dict(self.properties))

    def with_tags(self, tags) -> "ColumnSchema":
        out = ColumnSchema(self.name, self.dtype, self.tags, self.properties)
        out.tags |= set([tags] if isinstance(tags, str) else tags)
        return out

    def to_dict(self) -> dict:
        return {
            "name": self.name,
            "dtype": self.dtype,
            "tags": sorted(self.tags),
            "properties": self.properties,
        }

    @classmethod
    def from_dict(cls, d: dict) -> "ColumnSchema":
        return cls(d["name"], d.get("dtype"), set(d.get("tags", ())),
                   d.get("properties", {}))

    def __repr__(self):
        return f"ColumnSchema({self.name!r}, {self.dtype!r}, tags={sorted(self.tags)})"


class Schema:
    def __init__(self, columns: Optional[List] = None):
        # accept bare names as a convenience (reference Schema(["x"]))
        cols = [c if isinstance(c, ColumnSchema) else ColumnSchema(str(c))
                for c in (columns or [])]
        self.column_schemas: Dict[str, ColumnSchema] = {
            c.name: c for c in cols
        }

    @classmethod
    def from_spark(cls, spark_schema) -> "Schema":
        return cls([
            ColumnSchema(f.name, f.dataType.simpleString())
            for f in spark_schema.fields
        ])

    def __getitem__(self, name: str) -> ColumnSchema:
        return self.column_schemas[name]

    def __contains__(self, name: str) -> bool:
        return name in self.column_schemas

    @property
    def column_names(self) -> List[str]:
        return list(self.column_schemas)

    def select_by_tag(self, tag: str) -> List[str]:
        return [n for n, c in self.column_schemas.items() if tag in c.tags]

    def select_by_tags(self, tags) -> List[str]:
        """Names of columns carrying ALL the given tags — the matching
        rule of a tag-driven selector, ``ColumnSelector(tags=[...])``
        (reference tests/unit/workflow/test_workflow.py:84,
        test_workflow_schemas.py:197-208)."""
        want = set([tags] if isinstance(tags, str) else tags)
        return [n for n, c in self.column_schemas.items() if want <= c.tags]

    def to_dict(self) -> dict:
        return {"columns": [c.to_dict() for c in self.column_schemas.values()]}

    @classmethod
    def from_dict(cls, d: dict) -> "Schema":
        return cls([ColumnSchema.from_dict(c) for c in d.get("columns", ())])

    def __repr__(self):
        return f"Schema({self.column_names})"
