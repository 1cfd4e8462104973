from .transform import (asof_join_stream, drop_exact_duplicates_stream,
                        expanding_te_stream,
                        lag_rolling_stream, psi_stream, sessionize_stream,
                        transform_stream, windowed_agg_stream)

__all__ = ["asof_join_stream", "drop_exact_duplicates_stream",
           "expanding_te_stream",
           "lag_rolling_stream", "psi_stream", "sessionize_stream",
           "transform_stream", "windowed_agg_stream"]
