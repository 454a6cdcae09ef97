from . import encodings, iwe, resize, scatter, spike  # noqa: F401
from .spike import arctanspike, get_spike_fn, mgspike, superspike, trianglespike  # noqa: F401
