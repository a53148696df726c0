from .ip import ip_to_long, long_to_ip  # noqa: F401
from .hashing import hash64, hash64_hex_width  # noqa: F401
from .vectors import cosine_similarity, dot, l2_norm, to_double_array  # noqa: F401
