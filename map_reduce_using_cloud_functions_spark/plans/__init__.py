from . import relational, events

__all__ = ["relational", "events"]
