from .orbax_io import (load_checkpoint, save_checkpoint,  # noqa: F401
                       wait_for_saves)
