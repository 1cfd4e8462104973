from .artifacts import materialize
from .checkpoint import (load_manifest, run_partitioned,
                         save_manifest, table_lineage)
from .dataset import (Dataset, inspect_dataset, read_dataset, shuffle_by_keys,
                      synthetic_tabular, tokenized_sequences, write_bucketed,
                      write_shuffled)

__all__ = ["Dataset", "materialize", "load_manifest", "run_partitioned", "save_manifest",
           "inspect_dataset", "read_dataset", "shuffle_by_keys",
           "synthetic_tabular", "tokenized_sequences", "write_bucketed",
           "write_shuffled"]
