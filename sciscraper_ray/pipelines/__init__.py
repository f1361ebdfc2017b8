"""Named pipeline builders — the analog of the reference's SCISCRAPERS
factory registry (/root/reference/src/factories.py:26-103). Each builder is
``Callable[..., ray.data.Dataset]``; none owns a Ray session."""

from sciscraper_ray.pipelines.flagship import wordscore_pipeline

__all__ = ["wordscore_pipeline"]
