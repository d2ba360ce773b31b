"""Interactive terminal chat demo.

The reference README points to a gradio demo that is not in its tree
(Readme.md:34); this is the equivalent terminal REPL over the same
Conversation/Chat API (myriad_tpu/conversation/).

Usage:
    python demo.py --cfg-path eval_configs/myriad.yaml --image path/to.png
"""

import argparse
import sys

import numpy as np
from PIL import Image

import myriad_tpu.datasets  # noqa: F401 - registration
import myriad_tpu.models  # noqa: F401 - registration
import myriad_tpu.processors  # noqa: F401 - registration
from myriad_tpu.common import dist
from myriad_tpu.common.config import Config
from myriad_tpu.common.logger import setup_logger
from myriad_tpu.common.registry import registry
from myriad_tpu.conversation import CONV_VISION, Chat
from myriad_tpu.processors.blip_processors import LocImageTrainProcessor


def main():
    parser = argparse.ArgumentParser(description="Myriad chat demo")
    parser.add_argument("--cfg-path", required=True)
    parser.add_argument("--image", required=True, help="image to chat about")
    parser.add_argument("--max-new-tokens", type=int, default=90)
    parser.add_argument("--options", nargs="+")
    args = parser.parse_args()

    cfg = Config(args)
    dist.configure_platform(cfg.run_cfg.get("device") if cfg.config.get("run") else None)
    setup_logger()

    model_cls = registry.get_model_class(cfg.model_cfg.arch)
    model = model_cls.from_config(cfg.model_cfg)
    chat = Chat(model, LocImageTrainProcessor(identity=True))

    conv = CONV_VISION.copy()
    img_list = []
    size = model.arch.img_size
    image = Image.open(args.image).convert("RGB").resize((size, size))
    print(chat.upload_img(np.asarray(image), conv, img_list))
    print("Type a question ('quit' to exit).")
    while True:
        try:
            q = input("you> ").strip()
        except (EOFError, KeyboardInterrupt):
            break
        if not q or q.lower() in ("quit", "exit"):
            break
        chat.ask(q, conv)
        text, _ = chat.answer(conv, img_list, max_new_tokens=args.max_new_tokens)
        print("myriad>", text)


if __name__ == "__main__":
    main()
