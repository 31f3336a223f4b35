from eesen_tpu.recipes.config import RecipeConfig, RECIPES
from eesen_tpu.recipes.labels import prep_ctc_trans, lexicon_numbers

__all__ = ["RecipeConfig", "RECIPES", "prep_ctc_trans", "lexicon_numbers"]
