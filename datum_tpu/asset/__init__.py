"""Asset system: binary .pack pipeline, asset manager, core pack.

Format-compatible with the reference asset pipeline (reference:
src/assetpack.h wire structs, src/asset.{h,cpp} manager,
src/corepack.h built-in ids) so existing .pack files load unmodified.
"""

from .pack import PackReader, PackWriter, AssetInfo
from .corepack import CoreAsset, CORE_MAGIC, CORE_VERSION
from .manager import AssetManager
