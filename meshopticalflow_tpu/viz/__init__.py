from meshopticalflow_tpu.viz.surface import (Camera, render_surface,
                                             view_flow, view_spectrum)
from meshopticalflow_tpu.viz.live import (KeyboardCallBack, LiveViewer,
                                          TerminalDisplay, render_rgb)
