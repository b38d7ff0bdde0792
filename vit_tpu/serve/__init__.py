from vit_tpu.serve.export import (export_tokenizer, export_classifier,  # noqa: F401
                                  export_videogpt, load_exported, export_fn)
