from .fn import (GenFn, gen, param, init_param, get_param, set_param,
                 get_param_grad, zero_param_grad, set_param_grad)
from .handlers import trace_at, active_handler
from .trace import DynamicTrace, ChoiceRecord, CallRecord

__all__ = [
    "GenFn", "gen", "param", "init_param", "get_param", "set_param",
    "get_param_grad", "zero_param_grad", "set_param_grad",
    "trace_at", "active_handler", "DynamicTrace", "ChoiceRecord",
    "CallRecord",
]
