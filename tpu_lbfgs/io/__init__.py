from .checkpoint import load_state, save_state
