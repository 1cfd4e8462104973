from . import ann, dedup, drift, lm, text
from .hashing import hash64, hash_bucket, md5_bucket_sql, md5_hash64_sql
from .ids import with_global_index
from .skew import configure_aqe, salted_agg, with_salt

__all__ = ["ann", "dedup", "drift", "lm", "text",
           "hash64", "hash_bucket", "md5_bucket_sql", "md5_hash64_sql",
           "with_global_index", "configure_aqe", "salted_agg", "with_salt"]
