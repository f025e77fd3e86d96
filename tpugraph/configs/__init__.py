from tpugraph.configs.configs import TrainConfig, CONFIGS, get_config
from tpugraph.configs.recipes import RECIPES
