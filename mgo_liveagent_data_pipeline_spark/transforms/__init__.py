"""Route-level transforms — the reference's process_* helpers as lazy
DataFrame functions (extraction_helpers.py, TicketMessageProcessor.py)."""
from .messages import process_messages, resolve_sender_receiver
from .tickets import process_agents, process_tags, process_tickets

__all__ = [
    "process_agents",
    "process_messages",
    "process_tags",
    "process_tickets",
    "resolve_sender_receiver",
]
