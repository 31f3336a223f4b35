from eesen_tpu.ops.ctc import ctc_loss, ctc_forward_backward, expand_labels

__all__ = ["ctc_loss", "ctc_forward_backward", "expand_labels"]
