from .text import norm_text, with_turn_order, with_conversation_context  # noqa: F401
