"""User-facing pipelines: the maintenance Table API + query pipelines."""

from realtime_clickstream_lakehouse_ray.pipelines.table import Table

__all__ = ["Table"]
