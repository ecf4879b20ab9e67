"""Offline tools: asset compiler, OBJ parser, pack utilities, IBL baker.

Reference parity: tools/ — assetbuilder (core.pack), assetpacker,
objparser, assetcompressor, assetdump, bc3 codec, ibl baker.
"""
