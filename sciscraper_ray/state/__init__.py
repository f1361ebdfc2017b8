from sciscraper_ray.state.checkpoint import CheckpointStore, run_resumable
from sciscraper_ray.state.lineage import fragment_id, lineage_for_table

__all__ = ["CheckpointStore", "run_resumable", "fragment_id", "lineage_for_table"]
