from .ranking import filtered_ranking_metrics  # noqa: F401
