from .sharding import encoder_param_specs, constrain_params, shard_params

__all__ = ["encoder_param_specs", "constrain_params", "shard_params"]
