from sm3x.cli.parser import (
    get_parser,
    ssl_config,
    mlc_train_config,
    eval_config,
    base_configs,
)

__all__ = ["get_parser", "ssl_config", "mlc_train_config", "eval_config",
           "base_configs"]
