from myriad_tpu.conversation.conversation import CONV_VISION, Chat, Conversation

__all__ = ["Conversation", "Chat", "CONV_VISION"]
