"""Durable engine state: snapshot log (ACID / time travel) + job checkpoints."""

from realtime_clickstream_lakehouse_ray.state.log import CommitConflict, FileEntry, SnapshotLog
from realtime_clickstream_lakehouse_ray.state.checkpoint import JobCheckpoint

__all__ = ["SnapshotLog", "FileEntry", "CommitConflict", "JobCheckpoint"]
