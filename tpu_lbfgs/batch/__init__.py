from .vmapped import vmap_minimize
