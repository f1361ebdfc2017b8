"""map_batches stages. Stateful stages are callable classes (actor pools):
setup in ``__init__`` once per actor, vectorized work in ``__call__``."""
