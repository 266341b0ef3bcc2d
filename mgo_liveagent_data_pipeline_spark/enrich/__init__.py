"""Enrichment stages — the reference's external-service operators.

* U1 LLM conversation analysis (core/extract/ConvoDataExtract.py:37-187,
  core/LLMGateway.py:39-136) → ``convo.analyze_conversations``:
  applyInPandas over the group key with an injectable gateway; the default
  stub gateway is hash-deterministic so results are oracle-checkable.
* U2 geocode with external fallback (core/Geocode.py:91-157) →
  ``geocode.geocode_with_fallback``: native two-phase similarity join for
  the bulk, rate-limited mapPartitions fallback for residual misses.
"""
from .convo import analyze_conversations
from .gateway import StubGateway
from .geocode import geocode_with_fallback

__all__ = ["analyze_conversations", "StubGateway", "geocode_with_fallback"]
