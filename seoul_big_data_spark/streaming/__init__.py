from .batch_windows import hourly_rollup, session_stats  # noqa: F401
