"""Extend a base tokenizer with the multimodal special tokens
(reference scripts/tools/add_special_tokens_to_tokenizer.py:1-36):
<unk> as pad, 100 <img_xxxxx> ladder tokens, <img></img><patch></patch>
span delimiters, 224 <loc-x> grid tokens, and box tokens.
"""

import argparse


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--base", type=str, required=True,
                        help="base tokenizer path / HF id")
    parser.add_argument("--out", type=str, required=True)
    parser.add_argument("--num_img_tokens", type=int, default=100)
    parser.add_argument("--num_loc_tokens", type=int, default=224)
    args = parser.parse_args()

    from transformers import AutoTokenizer

    tokenizer = AutoTokenizer.from_pretrained(args.base)
    tokenizer.pad_token = "<unk>"

    new_tokens = ["<img>", "</img>", "<patch>", "</patch>"]
    new_tokens += [f"<img_{i:05d}>" for i in range(args.num_img_tokens)]
    new_tokens += [f"<loc-{i}>" for i in range(args.num_loc_tokens)]
    new_tokens += ["<box_start>", "<box_end>"]

    added = tokenizer.add_tokens(new_tokens, special_tokens=True)
    print(f"added {added} tokens; vocab -> {len(tokenizer)}")
    tokenizer.save_pretrained(args.out)


if __name__ == "__main__":
    main()
