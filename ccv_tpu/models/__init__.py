from ccv_tpu.models import vgg, convnet

__all__ = ["vgg", "convnet"]
