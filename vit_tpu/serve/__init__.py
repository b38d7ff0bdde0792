from vit_tpu.serve.export import (export_tokenizer, load_exported,  # noqa: F401
                                  export_fn)
