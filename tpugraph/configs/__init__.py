from tpugraph.configs.configs import TrainConfig, CONFIGS, get_config
