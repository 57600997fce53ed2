from mars_tpu.text import tokenizer, prompts, retriever, visual_prompts
