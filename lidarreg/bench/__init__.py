from .harness import (  # noqa: F401
    EvalConfig,
    evaluate_pairs,
    analyze_stats,
    save_shard,
    merge_shards,
    write_log,
)
from .registration import FRConfig, make_fr_register, make_pointdsc_register  # noqa: F401
