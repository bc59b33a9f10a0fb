"""Structured Streaming surfaces.

The reference crawler is batch-iterative (cron waves — SURVEY.md §2.9:
no streaming requirement), but its monitors (A1) and sink batching (A3)
have natural continuous counterparts when the fetch log or discovered-URL
feed arrives as a stream. These modules provide them on the same schemas
the batch operators use, so a deployment can run either mode.
"""

from . import dedup, monitor  # noqa: F401
