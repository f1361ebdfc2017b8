"""Pure kernels: exact reference semantics, vectorized where hot.

Each kernel is a pure function over Python scalars or Arrow/numpy arrays.
No Ray imports here — kernels are unit-testable without a cluster and are
called from ``map_batches`` UDFs in ``sciscraper_ray.stages``.
"""

from sciscraper_ray.kernels.wordscore import calculate_likelihood, wordscore_vec
from sciscraper_ray.kernels.tokenize import format_manuscript, tokenize_column
from sciscraper_ray.kernels.terms import match_terms, top_terms_exploded
from sciscraper_ray.kernels.identifiers import extract_identifier, standardize_identifier
from sciscraper_ray.kernels.parentheticals import find_parentheticals
from sciscraper_ray.kernels.links import format_download_link, search_field_for

__all__ = [
    "calculate_likelihood",
    "wordscore_vec",
    "format_manuscript",
    "tokenize_column",
    "match_terms",
    "top_terms_exploded",
    "extract_identifier",
    "standardize_identifier",
    "find_parentheticals",
    "format_download_link",
    "search_field_for",
]
