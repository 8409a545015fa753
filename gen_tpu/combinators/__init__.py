from .vector import (VectorChoiceMap, vector_choicemap, try_densify,
                     tree_stack, tree_index)
from .map_combinator import Map, MapCombinator, MapTrace
from .unfold import Unfold, UnfoldCombinator, UnfoldTrace
from .at import choice_at, call_at, ChoiceAtCombinator, CallAtCombinator
from .switch import Switch, SwitchCombinator, SwitchTrace
from .recurse import Recurse, RecurseCombinator, RecurseTrace
from .recurse_leveled import RecurseLeveled, LeveledRecurseCombinator
from .arena import UnfoldArena, ArenaTrace, smc_run
from .custom_determ import (CustomDetermGF, CustomUpdateGF, CustomGradientGF,
                            CustomDetermGFTrace)

__all__ = [
    "VectorChoiceMap", "vector_choicemap", "try_densify", "tree_stack",
    "tree_index",
    "Map", "MapCombinator", "MapTrace",
    "Unfold", "UnfoldCombinator", "UnfoldTrace",
    "choice_at", "call_at", "ChoiceAtCombinator", "CallAtCombinator",
    "Switch", "SwitchCombinator", "SwitchTrace",
    "CustomDetermGF", "CustomUpdateGF", "CustomGradientGF",
    "CustomDetermGFTrace",
    "Recurse", "RecurseCombinator", "RecurseTrace",
    "RecurseLeveled", "LeveledRecurseCombinator",
    "UnfoldArena", "ArenaTrace", "smc_run",
]
