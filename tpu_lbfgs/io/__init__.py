from .checkpoint import (
    load_state,
    load_state_sharded,
    save_state,
    save_state_sharded,
)
