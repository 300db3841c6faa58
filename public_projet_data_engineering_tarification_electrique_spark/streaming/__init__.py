from .daily import stream_daily_event_avg, stream_daily_ingest  # noqa: F401
