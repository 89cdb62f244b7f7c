// Minimal from-scratch OpenVDB (.vdb) reader for FloatGrid (Tree_float_5_4_3).
//
// TPU-native replacement for the reference's OpenVDB-based loader
// (reference vdbloader/load_vdb.cpp:17-158): same contract — read the first
// float grid, return a dense row-major (z, y, x) array over the active-voxel
// bounding box — but with zero third-party dependencies (the reference links
// all of OpenVDB + TBB + Blosc; this file is self-contained C++17 + libz).
//
// Format coverage (file versions 220–224 exercised by tests/test_vdb.py
// round-trips and the libblosc/real-frame cross-checks; 218–219 headers are
// parsed best-effort — the pre-219 legacy transform/gridmap layouts are NOT
// implemented and raise ParseError — and versions up to 260 are accepted
// optimistically since the format has been stable since 224):
//   * archive header, grid descriptors, metadata maps, transform blobs
//   * Tree_float_5_4_3 topology: RootNode tiles/children, Internal 32^3 and
//     16^3 node masks + packed tile values, 8^3 leaves
//   * leaf buffer codecs: uncompressed, ZIP (zlib), BLOSC (shuffle + LZ4
//     decoded by hand — no libblosc), each optionally under the
//     active-mask compression introduced in file version 222, and both
//     float and half (uint16) leaf payloads
//
// Known simplifications: instanced grids are re-read rather than aliased;
// multi-pass leaf buffers (PointDataGrid) and non-float grids are skipped.
//
// Exposed C ABI (used by volume/loaders.py via ctypes):
//   float* vdb_read_first_float_grid(path, &nx, &ny, &nz)  // malloc'd
//   void   vdb_free(float*)
//   const char* vdb_last_error()

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>
#include <stdexcept>
#include <memory>

#include <zlib.h>

namespace {

// ---------------------------------------------------------------- errors
thread_local std::string g_error;

struct ParseError : std::runtime_error {
    using std::runtime_error::runtime_error;
};

// ---------------------------------------------------------------- stream
struct Reader {
    const uint8_t* p;
    const uint8_t* end;
    const uint8_t* base;

    size_t pos() const { return size_t(p - base); }
    void need(size_t n) const {
        if (size_t(end - p) < n) throw ParseError("unexpected EOF");
    }
    void skip(size_t n) { need(n); p += n; }
    void seek(size_t off) {
        if (off > size_t(end - base)) throw ParseError("bad seek");
        p = base + off;
    }
    template <typename T> T get() {
        need(sizeof(T));
        T v;
        std::memcpy(&v, p, sizeof(T));
        p += sizeof(T);
        return v;
    }
    std::string getString() {
        uint32_t n = get<uint32_t>();
        if (n > (1u << 30)) throw ParseError("absurd string length");
        need(n);
        std::string s(reinterpret_cast<const char*>(p), n);
        p += n;
        return s;
    }
    void getBytes(void* dst, size_t n) {
        need(n);
        std::memcpy(dst, p, n);
        p += n;
    }
};

// ------------------------------------------------------------------ zlib
std::vector<uint8_t> zipDecompress(const uint8_t* src, size_t n,
                                   size_t expect) {
    std::vector<uint8_t> out(expect);
    uLongf outLen = expect;
    int rc = ::uncompress(out.data(), &outLen, src, n);
    if (rc != Z_OK) throw ParseError("zlib uncompress failed");
    out.resize(outLen);
    return out;
}

// ------------------------------------------------------------- blosc/LZ4
// Blosc1 frame: 16-byte header
//   [0] version  [1] versionlz  [2] flags  [3] typesize
//   [4..7] nbytes  [8..11] blocksize  [12..15] cbytes   (little endian)
// flags bit0 = byte shuffle, bit1 = memcpy'd, bits 5-7 = codec (1 = LZ4).
// Payload: int32 offsets[nblocks] then per-block [int32 cbytes][lz4 block].
size_t lz4DecompressBlock(const uint8_t* src, size_t srcLen, uint8_t* dst,
                          size_t dstCap) {
    const uint8_t* sp = src;
    const uint8_t* sEnd = src + srcLen;
    uint8_t* dp = dst;
    uint8_t* dEnd = dst + dstCap;
    while (sp < sEnd) {
        uint8_t token = *sp++;
        size_t lit = token >> 4;
        if (lit == 15) {
            uint8_t b;
            do {
                if (sp >= sEnd) throw ParseError("lz4: literal overrun");
                b = *sp++;
                lit += b;
            } while (b == 255);
        }
        if (sp + lit > sEnd || dp + lit > dEnd)
            throw ParseError("lz4: literal out of range");
        std::memcpy(dp, sp, lit);
        sp += lit;
        dp += lit;
        if (sp >= sEnd) break;  // last literals
        if (sp + 2 > sEnd) throw ParseError("lz4: truncated offset");
        size_t offset = sp[0] | (size_t(sp[1]) << 8);
        sp += 2;
        if (offset == 0 || offset > size_t(dp - dst))
            throw ParseError("lz4: bad offset");
        size_t mlen = token & 15;
        if (mlen == 15) {
            uint8_t b;
            do {
                if (sp >= sEnd) throw ParseError("lz4: match overrun");
                b = *sp++;
                mlen += b;
            } while (b == 255);
        }
        mlen += 4;
        if (dp + mlen > dEnd) throw ParseError("lz4: match out of range");
        const uint8_t* mp = dp - offset;
        for (size_t i = 0; i < mlen; ++i) dp[i] = mp[i];  // overlapping ok
        dp += mlen;
    }
    return size_t(dp - dst);
}

std::vector<uint8_t> bloscDecompress(const uint8_t* src, size_t n) {
    if (n < 16) throw ParseError("blosc: short header");
    uint8_t flags = src[2];
    uint8_t typesize = src[3];
    uint32_t nbytes, blocksize, cbytes;
    std::memcpy(&nbytes, src + 4, 4);
    std::memcpy(&blocksize, src + 8, 4);
    std::memcpy(&cbytes, src + 12, 4);
    if (cbytes < 16 || cbytes > n) throw ParseError("blosc: bad cbytes");
    // Plausibility bound before allocating: the archive's frames hold at
    // most one 32^3 internal node's float tiles (128 KiB); a corrupt
    // header could otherwise demand a 4 GiB allocation (DoS).
    if (nbytes > (1u << 26)) throw ParseError("blosc: absurd nbytes");
    std::vector<uint8_t> out(nbytes);
    if (nbytes == 0) return out;

    const bool memcpyed = flags & 0x2;
    if (memcpyed) {
        if (16 + size_t(nbytes) > n) throw ParseError("blosc: short memcpy");
        std::memcpy(out.data(), src + 16, nbytes);
        return out;
    }
    int codec = (flags >> 5) & 0x7;
    if (codec != 1)  // blosclz(0) unsupported; OpenVDB uses LZ4(1)
        throw ParseError("blosc: unsupported inner codec");
    if (blocksize == 0) throw ParseError("blosc: zero blocksize");
    size_t nblocks = (nbytes + blocksize - 1) / blocksize;
    if (16 + nblocks * 4 > n) throw ParseError("blosc: short offsets");
    std::vector<uint8_t> tmp(nbytes);
    for (size_t b = 0; b < nblocks; ++b) {
        uint32_t off32;
        std::memcpy(&off32, src + 16 + 4 * b, 4);
        size_t off = off32;  // widen before bounds arithmetic (no wrap)
        size_t bsize = std::min<size_t>(blocksize, nbytes - b * blocksize);
        // Block splitting (verified against libblosc.so.1 empirically and
        // mirrored by io/vdb.py:_blosc_lz4_frame): for blosclz/lz4 a full
        // block is cut into `typesize` sub-streams, each preceded by its
        // own int32 csize, iff blocksize/typesize >= 128 (MIN_BUFFERSIZE)
        // and typesize <= 16 (MAX_SPLITS).  Newer c-blosc also records the
        // decision in flags bit 4 (dont_split); a partial final block
        // never splits.
        const bool dont_split = flags & 0x10;
        size_t nsplits = 1;
        if (!dont_split && typesize > 1 && typesize <= 16 &&
            bsize == blocksize && blocksize % typesize == 0 &&
            blocksize / typesize >= 128)
            nsplits = typesize;
        size_t neblock = bsize / nsplits;
        for (size_t s = 0; s < nsplits; ++s) {
            if (off + 4 > n) throw ParseError("blosc: bad block offset");
            int32_t csize;
            std::memcpy(&csize, src + off, 4);
            if (csize < 0 || off + 4 + size_t(csize) > n)
                throw ParseError("blosc: bad block size");
            uint8_t* dst = tmp.data() + b * blocksize + s * neblock;
            // blosc stores an incompressible chunk as csize == neblock raw
            if (size_t(csize) == neblock) {
                std::memcpy(dst, src + off + 4, neblock);
            } else {
                size_t got = lz4DecompressBlock(src + off + 4, csize, dst,
                                                neblock);
                if (got != neblock) throw ParseError("blosc: block short");
            }
            off += 4 + size_t(csize);
        }
        // byte shuffle is applied per block
        if ((flags & 0x1) && typesize > 1) {
            uint8_t* blk = tmp.data() + b * blocksize;
            size_t elems = bsize / typesize;
            uint8_t* obk = out.data() + b * blocksize;
            for (size_t e = 0; e < elems; ++e)
                for (size_t t = 0; t < typesize; ++t)
                    obk[e * typesize + t] = blk[t * elems + e];
            // trailing bytes that don't fill an element are copied verbatim
            std::memcpy(obk + elems * typesize, blk + elems * typesize,
                        bsize - elems * typesize);
        } else {
            std::memcpy(out.data() + b * blocksize,
                        tmp.data() + b * blocksize, bsize);
        }
    }
    return out;
}

// ----------------------------------------------------------------- half
float halfToFloat(uint16_t h) {
    uint32_t sign = uint32_t(h >> 15) << 31;
    uint32_t exp = (h >> 10) & 0x1F;
    uint32_t man = h & 0x3FF;
    uint32_t bits;
    if (exp == 0) {
        if (man == 0) {
            bits = sign;
        } else {  // subnormal
            exp = 127 - 15 + 1;
            while (!(man & 0x400)) {
                man <<= 1;
                --exp;
            }
            man &= 0x3FF;
            bits = sign | (exp << 23) | (man << 13);
        }
    } else if (exp == 31) {
        bits = sign | 0x7F800000u | (man << 13);
    } else {
        bits = sign | ((exp - 15 + 127) << 23) | (man << 13);
    }
    float f;
    std::memcpy(&f, &bits, 4);
    return f;
}

// ----------------------------------------------------------- archive bits
// file-version milestones (openvdb/Types.h)
enum : uint32_t {
    VER_BOOST_UUID = 218,
    VER_NO_GRIDMAP = 219,
    VER_NEW_TRANSFORM = 219,
    VER_SELECTIVE_COMPRESSION = 220,
    VER_FLOAT_FRUSTUM_BBOX = 221,
    VER_NODE_MASK_COMPRESSION = 222,
    VER_BLOSC_COMPRESSION = 223,
};

enum : uint32_t {
    COMPRESS_NONE = 0,
    COMPRESS_ZIP = 0x1,
    COMPRESS_ACTIVE_MASK = 0x2,
    COMPRESS_BLOSC = 0x4,
};

struct Meta {
    std::string type;
    std::vector<uint8_t> value;
};

using MetaMap = std::vector<std::pair<std::string, Meta>>;

MetaMap readMetaMap(Reader& r) {
    MetaMap m;
    int32_t count = r.get<int32_t>();
    if (count < 0 || count > 1 << 20) throw ParseError("bad meta count");
    for (int32_t i = 0; i < count; ++i) {
        std::string name = r.getString();
        Meta meta;
        meta.type = r.getString();
        uint32_t n = r.get<uint32_t>();
        if (n > (1u << 30)) throw ParseError("absurd meta size");
        meta.value.resize(n);
        r.getBytes(meta.value.data(), n);
        m.emplace_back(std::move(name), std::move(meta));
    }
    return m;
}

void skipTransform(Reader& r) {
    // transform = map type name + map payload (all doubles / ints, size
    // depends on type).  We don't need world placement (the renderer builds
    // its box from the dense aspect like the reference, volumeRender.cpp:
    // 1336-1339), so parse just enough to skip.
    std::string type = r.getString();
    auto d = [&](int n) { r.skip(size_t(n) * 8); };
    if (type == "UniformScaleMap" || type == "ScaleMap") {
        // ScaleMap payload: mScaleValues, mVoxelSize, mScaleValuesInverse,
        // mInvScaleSqr, mInvTwiceScale — 5 Vec3d
        d(15);
    } else if (type == "TranslationMap") {
        d(3);
    } else if (type == "UniformScaleTranslateMap" ||
               type == "ScaleTranslateMap") {
        d(18);  // ScaleMap's 5 Vec3d + translation
    } else if (type == "AffineMap") {
        d(16);  // 4x4 double matrix
    } else if (type == "NonlinearFrustumMap") {
        throw ParseError("frustum transforms unsupported");
    } else {
        throw ParseError("unknown transform map: " + type);
    }
}

// ------------------------------------------------------------- node masks
struct BitMask {
    std::vector<uint64_t> words;
    size_t bits = 0;

    void load(Reader& r, size_t nbits) {
        bits = nbits;
        words.assign((nbits + 63) / 64, 0);
        r.getBytes(words.data(), nbits / 8);
    }
    bool test(size_t i) const {
        return (words[i >> 6] >> (i & 63)) & 1;
    }
    size_t count() const {
        size_t c = 0;
        for (uint64_t w : words) c += size_t(__builtin_popcountll(w));
        return c;
    }
};

// ------------------------------------------------------------ value codec
// io::readCompressedValues<float>: reads `num` values subject to the
// archive compression flags + per-buffer active-mask metadata.
struct ValueCodec {
    uint32_t fileVersion;
    uint32_t compression;
    bool halfFloats;

    size_t valueBytes() const { return halfFloats ? 2 : 4; }

    std::vector<float> convert(const std::vector<uint8_t>& raw,
                               size_t num) const {
        std::vector<float> out(num);
        if (halfFloats) {
            if (raw.size() < num * 2) throw ParseError("short half payload");
            const uint16_t* h = reinterpret_cast<const uint16_t*>(raw.data());
            for (size_t i = 0; i < num; ++i) out[i] = halfToFloat(h[i]);
        } else {
            if (raw.size() < num * 4) throw ParseError("short payload");
            std::memcpy(out.data(), raw.data(), num * 4);
        }
        return out;
    }

    // Read a compressed payload of `num` stored values.
    std::vector<float> readValues(Reader& r, size_t num) const {
        if (compression & COMPRESS_ZIP) {
            int64_t n = r.get<int64_t>();
            if (n <= 0) {
                // negative size => uncompressed passthrough
                size_t raw = size_t(-n);
                std::vector<uint8_t> buf(raw);
                r.getBytes(buf.data(), raw);
                return convert(buf, num);
            }
            std::vector<uint8_t> comp((size_t)n);
            r.getBytes(comp.data(), size_t(n));
            auto buf = zipDecompress(comp.data(), comp.size(),
                                     num * valueBytes());
            return convert(buf, num);
        }
        if (compression & COMPRESS_BLOSC) {
            int64_t n = r.get<int64_t>();
            if (n <= 0) {
                size_t raw = size_t(-n);
                std::vector<uint8_t> buf(raw);
                r.getBytes(buf.data(), raw);
                return convert(buf, num);
            }
            std::vector<uint8_t> comp((size_t)n);
            r.getBytes(comp.data(), size_t(n));
            auto buf = bloscDecompress(comp.data(), comp.size());
            return convert(buf, num);
        }
        std::vector<uint8_t> buf(num * valueBytes());
        r.getBytes(buf.data(), buf.size());
        return convert(buf, num);
    }

    // Leaf/internal buffer with optional active-mask compression
    // (io::readCompressedValues): layout for fileVersion >= 222:
    //   int8 metadata; [inactiveVal1]; [inactiveVal0]; [selection mask];
    //   compressed payload of `storedCount` values
    // metadata codes (openvdb/io/Compression.h):
    //   0 NO_MASK_OR_INACTIVE_VALS    (payload = all values if no mask
    //                                  compression, else actives only)
    //   1 NO_MASK_AND_MINUS_BG        (inactive = -background)
    //   2 NO_MASK_AND_ONE_INACTIVE_VAL
    //   3 MASK_AND_NO_INACTIVE_VALS
    //   4 MASK_AND_ONE_INACTIVE_VAL
    //   5 MASK_AND_TWO_INACTIVE_VALS
    //   6 NO_MASK_AND_ALL_VALS        (payload = all values even w/ mask
    //                                  compression)
    std::vector<float> readMaskedBuffer(Reader& r, const BitMask& valueMask,
                                        size_t num, float background) const {
        const bool maskCompressed =
            (fileVersion >= VER_NODE_MASK_COMPRESSION) &&
            (compression & COMPRESS_ACTIVE_MASK);
        int8_t meta = 6;  // NO_MASK_AND_ALL_VALS
        if (fileVersion >= VER_NODE_MASK_COMPRESSION) meta = r.get<int8_t>();

        float inactive0 = background, inactive1 = background;
        auto readVal = [&]() -> float {
            if (halfFloats) return halfToFloat(r.get<uint16_t>());
            return r.get<float>();
        };
        if (meta == 2 || meta == 4 || meta == 5) inactive0 = readVal();
        if (meta == 5) inactive1 = readVal();
        if (meta == 1) inactive0 = -background;

        BitMask selection;
        if (meta == 3 || meta == 4 || meta == 5) selection.load(r, num);

        size_t stored = num;
        if (maskCompressed && meta != 6) {
            // only active (and not selection-masked) values are stored
            stored = 0;
            for (size_t i = 0; i < num; ++i) {
                bool active = valueMask.test(i);
                bool masked = selection.bits ? selection.test(i) : false;
                if (active && !masked) ++stored;
            }
        }
        auto vals = readValues(r, stored);
        if (!maskCompressed || meta == 6) {
            vals.resize(num, background);
            return vals;
        }
        std::vector<float> out(num);
        size_t k = 0;
        for (size_t i = 0; i < num; ++i) {
            bool active = valueMask.test(i);
            bool masked = selection.bits ? selection.test(i) : false;
            if (active && !masked) {
                out[i] = vals[k++];
            } else if (masked) {
                out[i] = inactive1;  // selection-masked actives: 2nd value
            } else {
                out[i] = inactive0;
            }
        }
        return out;
    }
};

// ----------------------------------------------------------------- tree
struct Coord {
    int32_t x, y, z;
};

struct Leaf {           // 8^3
    Coord origin;
    BitMask valueMask;
    std::vector<float> values;  // 512, dense
};

struct Tile {           // constant active region (pruned subtree)
    Coord origin;
    int32_t span;
    float value;
};

struct DenseVolume {
    int64_t nx = 0, ny = 0, nz = 0;
    int32_t minx = 0, miny = 0, minz = 0;
    std::vector<float> data;  // (z, y, x) row-major
};

struct TreeReader {
    ValueCodec codec;
    std::vector<Leaf> leaves;
    std::vector<Tile> tiles;    // active constant tiles (pruned regions)
    float background = 0.f;

    // dims: node log2 dims of Tree_float_5_4_3 internal levels
    void readInternal(Reader& r, Coord origin, int level) {
        const int log2 = (level == 2) ? 5 : 4;             // 32^3 / 16^3
        const size_t n = size_t(1) << (3 * log2);
        const int childLog2Sum = (level == 2) ? (4 + 3) : 3;  // child span
        const int32_t childDim = 1 << childLog2Sum;

        BitMask childMask, valueMask;
        childMask.load(r, n);
        valueMask.load(r, n);

        // tile values for non-child slots
        std::vector<float> tileVals;
        if (codec.fileVersion < VER_NODE_MASK_COMPRESSION) {
            // older: plain array of n values (possibly zipped)
            tileVals = codec.readValues(r, n);
        } else {
            tileVals = codec.readMaskedBuffer(r, valueMask, n, background);
        }

        // children + active tiles, in bit order.  Active non-child slots
        // are pruned constant regions (openvdb::tools::prune collapses
        // uniform subtrees into tiles) — rasterized in bakeDense.
        const int dim = 1 << log2;
        for (size_t i = 0; i < n; ++i) {
            // bit index -> (x, y, z) offsets: OpenVDB packs as
            // i = x*dim^2 + y*dim + z  (x major)
            int32_t xi = int32_t(i >> (2 * log2));
            int32_t yi = int32_t((i >> log2) & (dim - 1));
            int32_t zi = int32_t(i & (dim - 1));
            Coord corg{origin.x + xi * childDim, origin.y + yi * childDim,
                       origin.z + zi * childDim};
            if (childMask.test(i)) {
                if (level == 2) {
                    readInternal(r, corg, 1);
                } else {
                    readLeafTopology(r, corg);
                }
            } else if (valueMask.test(i)) {
                tiles.push_back(Tile{corg, childDim,
                                     i < tileVals.size() ? tileVals[i]
                                                         : background});
            }
        }
    }

    void readLeafTopology(Reader& r, Coord origin) {
        Leaf lf;
        lf.origin = origin;
        lf.valueMask.load(r, 512);
        leaves.push_back(std::move(lf));
    }

    void readLeafBuffers(Reader& r) {
        for (auto& lf : leaves) {
            if (codec.fileVersion < VER_NODE_MASK_COMPRESSION) {
                lf.values = codec.readValues(r, 512);
            } else {
                lf.values = codec.readMaskedBuffer(r, lf.valueMask, 512,
                                                   background);
            }
        }
    }
};

DenseVolume bakeDense(const TreeReader& tree) {
    DenseVolume v;
    if (tree.leaves.empty() && tree.tiles.empty()) return v;
    int32_t minx = INT32_MAX, miny = INT32_MAX, minz = INT32_MAX;
    int32_t maxx = INT32_MIN, maxy = INT32_MIN, maxz = INT32_MIN;
    for (const auto& lf : tree.leaves) {
        if (!lf.valueMask.count()) continue;
        // tighten to active voxels within the leaf
        for (int i = 0; i < 512; ++i) {
            if (!lf.valueMask.test(size_t(i))) continue;
            int x = lf.origin.x + (i >> 6);
            int y = lf.origin.y + ((i >> 3) & 7);
            int z = lf.origin.z + (i & 7);
            minx = std::min(minx, x); maxx = std::max(maxx, x);
            miny = std::min(miny, y); maxy = std::max(maxy, y);
            minz = std::min(minz, z); maxz = std::max(maxz, z);
        }
    }
    for (const auto& t : tree.tiles) {
        minx = std::min(minx, t.origin.x);
        maxx = std::max(maxx, t.origin.x + t.span - 1);
        miny = std::min(miny, t.origin.y);
        maxy = std::max(maxy, t.origin.y + t.span - 1);
        minz = std::min(minz, t.origin.z);
        maxz = std::max(maxz, t.origin.z + t.span - 1);
    }
    if (minx > maxx) return v;
    v.minx = minx; v.miny = miny; v.minz = minz;
    v.nx = maxx - minx + 1;
    v.ny = maxy - miny + 1;
    v.nz = maxz - minz + 1;
    // Densification cap: default 2^31 elements (8 GiB of floats), raisable
    // via VDB_MAX_DENSE_ELEMS for genuinely huge grids — a hostile file
    // with two far-apart voxels could otherwise demand an absurd bake.
    int64_t cap = int64_t(1) << 31;
    if (const char* env = std::getenv("VDB_MAX_DENSE_ELEMS")) {
        long long parsed = std::atoll(env);
        if (parsed > 0) cap = parsed;
    }
    if (v.nx * v.ny * v.nz > cap)
        throw ParseError("dense volume too large (" +
                         std::to_string(v.nx * v.ny * v.nz) + " voxels; "
                         "raise VDB_MAX_DENSE_ELEMS to override)");
    v.data.assign(size_t(v.nx * v.ny * v.nz), 0.f);
    for (const auto& t : tree.tiles) {   // constant pruned regions first
        int64_t x0 = std::max<int64_t>(t.origin.x - minx, 0);
        int64_t y0 = std::max<int64_t>(t.origin.y - miny, 0);
        int64_t z0 = std::max<int64_t>(t.origin.z - minz, 0);
        int64_t x1 = std::min<int64_t>(t.origin.x + t.span - minx, v.nx);
        int64_t y1 = std::min<int64_t>(t.origin.y + t.span - miny, v.ny);
        int64_t z1 = std::min<int64_t>(t.origin.z + t.span - minz, v.nz);
        for (int64_t z = z0; z < z1; ++z)
            for (int64_t y = y0; y < y1; ++y)
                std::fill(v.data.begin() + ((z * v.ny + y) * v.nx + x0),
                          v.data.begin() + ((z * v.ny + y) * v.nx + x1),
                          t.value);
    }
    for (const auto& lf : tree.leaves) {
        for (int i = 0; i < 512; ++i) {
            // reference read_voxels copies *active* voxels only
            // (vdbloader/load_vdb.cpp:95-117)
            if (!lf.valueMask.test(size_t(i))) continue;
            int64_t x = lf.origin.x + (i >> 6) - minx;
            int64_t y = lf.origin.y + ((i >> 3) & 7) - miny;
            int64_t z = lf.origin.z + (i & 7) - minz;
            if (x < 0 || y < 0 || z < 0 || x >= v.nx || y >= v.ny ||
                z >= v.nz)
                continue;
            float val = lf.values.empty() ? 0.f : lf.values[size_t(i)];
            v.data[size_t((z * v.ny + y) * v.nx + x)] = val;
        }
    }
    return v;
}

// --------------------------------------------------------------- archive
struct GridDescriptor {
    std::string uniqueName;
    std::string type;
    bool halfFloats = false;
    uint64_t gridPos = 0, blockPos = 0, endPos = 0;
};

DenseVolume readArchive(Reader& r, int wantIndex) {
    int64_t magic = r.get<int64_t>();
    if (magic != 0x56444220)
        throw ParseError("not a VDB file (bad magic)");
    uint32_t fileVersion = r.get<uint32_t>();
    if (fileVersion < 218 || fileVersion > 260)
        throw ParseError("unsupported file version " +
                         std::to_string(fileVersion));
    r.get<uint32_t>();  // library major
    r.get<uint32_t>();  // library minor
    bool hasGridOffsets = r.get<uint8_t>() != 0;

    // the compression byte is present in every supported version; before
    // 220 it is a plain isCompressed bool (zlib or nothing)
    uint32_t compression;
    if (fileVersion >= VER_SELECTIVE_COMPRESSION) {
        compression = r.get<uint8_t>();
    } else {
        compression = r.get<uint8_t>() ? COMPRESS_ZIP : COMPRESS_NONE;
    }

    if (fileVersion >= VER_BOOST_UUID) {
        r.skip(36);  // ascii uuid
    } else {
        r.skip(16);
    }

    readMetaMap(r);  // archive metadata

    if (!hasGridOffsets)
        throw ParseError("streamed (non-seekable) archives unsupported");

    uint32_t gridCount = r.get<uint32_t>();
    if (gridCount == 0) throw ParseError("no grids");
    if (gridCount > 4096) throw ParseError("absurd grid count");

    std::vector<GridDescriptor> descs;
    for (uint32_t g = 0; g < gridCount; ++g) {
        GridDescriptor d;
        d.uniqueName = r.getString();
        d.type = r.getString();
        // the "save float as half" flag rides in the type name suffix
        const std::string halfSuffix = "_HalfFloat";
        if (d.type.size() > halfSuffix.size() &&
            d.type.compare(d.type.size() - halfSuffix.size(),
                           halfSuffix.size(), halfSuffix) == 0) {
            d.halfFloats = true;
            d.type.resize(d.type.size() - halfSuffix.size());
        }
        if (fileVersion >= 216) {
            // instance parent name (empty when not instanced)
            (void)r.getString();
        }
        d.gridPos = r.get<uint64_t>();
        d.blockPos = r.get<uint64_t>();
        d.endPos = r.get<uint64_t>();
        descs.push_back(d);
        r.seek(d.endPos);  // next descriptor follows the grid data
    }

    // pick the wanted float grid
    int found = -1;
    int fidx = 0;
    for (size_t i = 0; i < descs.size(); ++i) {
        if (descs[i].type == "Tree_float_5_4_3") {
            if (fidx == wantIndex) {
                found = int(i);
                break;
            }
            ++fidx;
        }
    }
    if (found < 0) throw ParseError("no float grid (Tree_float_5_4_3)");
    const GridDescriptor& d = descs[size_t(found)];

    r.seek(d.gridPos);
    // per-grid compression override (file version >= 222 writes it)
    uint32_t gridCompression = compression;
    if (fileVersion >= VER_NODE_MASK_COMPRESSION)
        gridCompression = r.get<uint32_t>();
    readMetaMap(r);  // grid metadata
    if (fileVersion < VER_NO_GRIDMAP) {
        (void)r.getString();  // grid name (older layout)
    }
    skipTransform(r);

    TreeReader tree;
    tree.codec.fileVersion = fileVersion;
    tree.codec.compression = gridCompression;
    tree.codec.halfFloats = d.halfFloats;

    // Tree::readTopology: uint32 #buffers(unused, ==1), then root
    uint32_t bufferCount = r.get<uint32_t>();
    if (bufferCount != 1)
        throw ParseError("multi-buffer trees unsupported");
    // RootNode background/tile values are plain floats regardless of the
    // save-float-as-half flag (toHalf applies only to the node buffers
    // written through io::writeCompressedValues)
    tree.background = r.get<float>();
    uint32_t numTiles = r.get<uint32_t>();
    uint32_t numChildren = r.get<uint32_t>();
    for (uint32_t t = 0; t < numTiles; ++t) {
        Coord c{r.get<int32_t>(), r.get<int32_t>(), r.get<int32_t>()};
        float val = r.get<float>();
        bool active = r.get<uint8_t>() != 0;
        if (active)  // root tiles span one whole top-level node (4096^3)
            tree.tiles.push_back(Tile{c, 1 << 12, val});
    }
    for (uint32_t c = 0; c < numChildren; ++c) {
        Coord org{r.get<int32_t>(), r.get<int32_t>(), r.get<int32_t>()};
        tree.readInternal(r, org, 2);
    }
    // Tree::readBuffers (leaf payloads, in topology order)
    tree.readLeafBuffers(r);
    return bakeDense(tree);
}

}  // namespace

extern "C" {

const char* vdb_last_error() { return g_error.c_str(); }

void vdb_free(float* p) { std::free(p); }

float* vdb_read_float_grid(const char* path, long grid_index, long* nx,
                           long* ny, long* nz) {
    g_error.clear();
    *nx = *ny = *nz = 0;
    FILE* f = std::fopen(path, "rb");
    if (!f) {
        g_error = "cannot open file";
        return nullptr;
    }
    std::fseek(f, 0, SEEK_END);
    long sz = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    std::vector<uint8_t> buf((size_t)sz);
    size_t got = std::fread(buf.data(), 1, size_t(sz), f);
    std::fclose(f);
    if (got != size_t(sz)) {
        g_error = "short read";
        return nullptr;
    }
    try {
        Reader r{buf.data(), buf.data() + buf.size(), buf.data()};
        DenseVolume v = readArchive(r, int(grid_index));
        if (v.data.empty()) {
            g_error = "empty grid";
            return nullptr;
        }
        float* out = static_cast<float*>(
            std::malloc(v.data.size() * sizeof(float)));
        if (!out) {
            g_error = "oom";
            return nullptr;
        }
        std::memcpy(out, v.data.data(), v.data.size() * sizeof(float));
        *nx = long(v.nx);
        *ny = long(v.ny);
        *nz = long(v.nz);
        return out;
    } catch (const std::exception& e) {
        g_error = e.what();
        return nullptr;
    }
}

float* vdb_read_first_float_grid(const char* path, long* nx, long* ny,
                                 long* nz) {
    return vdb_read_float_grid(path, 0, nx, ny, nz);
}

// Test entry: decode one blosc frame (tests/test_vdb_foreign.py
// cross-checks this against genuine libblosc output).  Returns the
// decompressed size, or -1 with vdb_last_error set.
long vdb_test_blosc_decompress(const uint8_t* src, long n, uint8_t* out,
                               long outcap) {
    g_error.clear();
    try {
        std::vector<uint8_t> res = bloscDecompress(src, size_t(n));
        if (long(res.size()) > outcap) {
            g_error = "output buffer too small";
            return -1;
        }
        std::memcpy(out, res.data(), res.size());
        return long(res.size());
    } catch (const std::exception& e) {
        g_error = e.what();
        return -1;
    }
}

}  // extern "C"
