from .upsert import latest_by_key, upsert_batch
from .changelog import current_state, changelog_stats
from .joins import flagship_join, ticket_view

__all__ = [
    "latest_by_key",
    "upsert_batch",
    "current_state",
    "changelog_stats",
    "flagship_join",
    "ticket_view",
]
