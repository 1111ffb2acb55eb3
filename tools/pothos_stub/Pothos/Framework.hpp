// Minimal single-block Pothos framework stub (TEST TOOLING).
//
// Just enough of the Pothos::Block API to compile and drive the
// *reference* repository's stream blocks (LoRaDemod.cpp) in-process as a
// golden oracle: one block, one contiguous input stream, message capture
// on output port 0, scratch buffers for the debug ports.  No scheduler,
// no threads, no dataflow graph — the test harness calls work() in a
// loop.  See tools/gen_demod_golden.cpp.
#pragma once

#include <complex>
#include <cstdint>
#include <cstring>
#include <map>
#include <memory>
#include <sstream>
#include <stdexcept>
#include <string>
#include <typeinfo>
#include <vector>

#define POTHOS_FCN_TUPLE(ClassName, fn) #fn, &ClassName::fn

namespace Pothos {

class Exception : public std::runtime_error
{
public:
    Exception(const std::string &what, const std::string &why)
        : std::runtime_error(what + ": " + why)
    {
    }
};

class InvalidArgumentException : public Exception
{
public:
    InvalidArgumentException(const std::string &what,
                             const std::string &why)
        : Exception(what, why)
    {
    }
};

//! Type-erased value holder (just enough for Packet messages).
class Object
{
public:
    Object(void) {}
    template <typename T>
    explicit Object(const T &v) : _p(std::make_shared<Holder<T>>(v))
    {
    }
    template <typename T> const T &extract(void) const
    {
        return static_cast<const Holder<T> *>(_p.get())->v;
    }

private:
    struct HolderBase
    {
        virtual ~HolderBase(void) {}
    };
    template <typename T> struct Holder : HolderBase
    {
        explicit Holder(const T &t) : v(t) {}
        T v;
    };
    std::shared_ptr<HolderBase> _p;
};

class Label
{
public:
    Label(void) : index(0) {}
    Label(const std::string &id_, const Object &, const size_t index_)
        : id(id_), index(index_) {}
    std::string id;
    size_t index;
};

class BufferChunk
{
public:
    BufferChunk(void) : length(0), ptr(nullptr), _esz(1) {}
    BufferChunk(const std::type_info &ti, const size_t numElems)
        : length(numElems * elemSize(ti)),
          _storage(std::make_shared<std::vector<uint8_t>>(
              numElems * elemSize(ti))),
          ptr(_storage->data()),
          _esz(elemSize(ti))
    {
    }
    size_t elements(void) const { return length / _esz; }
    static size_t elemSize(const std::type_info &ti)
    {
        if (ti == typeid(int16_t) or ti == typeid(uint16_t)) return 2;
        if (ti == typeid(std::complex<float>)) return 8;
        if (ti == typeid(float) or ti == typeid(int32_t)) return 4;
        return 1;
    }
    template <typename T> T as(void) const
    {
        return reinterpret_cast<T>(ptr);
    }
    size_t length;  // bytes (callers shrink it after production)

    // stub internals (public: harness + ports poke them directly)
    std::shared_ptr<std::vector<uint8_t>> _storage;
    void *ptr;
    size_t _esz;
};

class Packet
{
public:
    BufferChunk payload;
};

struct BufferManagerArgs
{
    size_t bufferSize = 8192;
};

class BufferManager
{
public:
    using Sptr = std::shared_ptr<BufferManager>;
    static Sptr make(const std::string &, const BufferManagerArgs & = {})
    {
        return std::make_shared<BufferManager>();
    }
};

//! Input port over one contiguous host vector (no ring: the harness owns
//! the whole stream and buffer() is a pointer at the read offset).
class InputPort
{
public:
    InputPort(void) : _offset(0), _reserve(1), _elemSize(1) {}

    void setReserve(const size_t n) { _reserve = n; }
    size_t elements(void) const
    {
        return _data.size() / _elemSize - _offset;
    }
    size_t totalElements(void) const { return _offset; }
    void consume(const size_t n) { _offset += n; }

    bool hasMessage(void) const { return _msgHead < _msgs.size(); }
    Object popMessage(void) { return _msgs.at(_msgHead++); }

    BufferChunk buffer(void)
    {
        BufferChunk b;
        b.ptr = _data.data() + _offset * _elemSize;
        b.length = elements() * _elemSize;
        return b;
    }

    // ---- harness side -----------------------------------------------------
    void feedBytes(const void *p, size_t bytes, size_t elemSize)
    {
        _elemSize = elemSize;
        const uint8_t *u = static_cast<const uint8_t *>(p);
        _data.insert(_data.end(), u, u + bytes);
    }
    size_t reserve(void) const { return _reserve; }
    void pushMessage(const Object &o) { _msgs.push_back(o); }

private:
    std::vector<uint8_t> _data;  // raw bytes
    size_t _offset;              // in elements
    size_t _reserve;
    size_t _elemSize;
    std::vector<Object> _msgs;
    size_t _msgHead = 0;
};

class OutputPort
{
public:
    OutputPort(void) : _produced(0), _scratch(1 << 20) {}

    void setReserve(const size_t) {}
    BufferChunk buffer(void)
    {
        BufferChunk b;
        b.ptr = _scratch.data();
        b.length = _scratch.size();
        return b;
    }
    void produce(const size_t n) { _produced += n; }
    size_t totalElements(void) const { return _produced; }
    void postLabel(const Label &l) { labels.push_back(l); }
    void postMessage(const Packet &p) { packets.push_back(p); }

    // ---- harness side -----------------------------------------------------
    std::vector<Packet> packets;
    std::vector<Label> labels;

private:
    size_t _produced;
    std::vector<uint8_t> _scratch;  // 1 MB: >= 2N complex<float> to N=4096
};

class Block
{
public:
    virtual ~Block(void) {}
    virtual void work(void) = 0;
    virtual void activate(void) {}
    virtual void deactivate(void) {}

    virtual BufferManager::Sptr getOutputBufferManager(
        const std::string &, const std::string &)
    {
        return BufferManager::make("generic");
    }
    virtual BufferManager::Sptr getInputBufferManager(
        const std::string &, const std::string &)
    {
        return BufferManager::make("generic");
    }

    template <typename... Args>
    void registerCall(Args &&...)
    {
    }
    void registerSignal(const std::string &) {}

    template <typename T>
    void emitSignal(const std::string &name, const T &value)
    {
        signals[name] = double(value);
    }

    void setupInput(const size_t idx, const std::type_info &ti = typeid(void))
    {
        _inputs[key(idx)].reset(new InputPort());
        _inputElemSize[key(idx)] = BufferChunk::elemSize(ti);
    }
    void setupInput(const std::string &name,
                    const std::type_info &ti = typeid(void))
    {
        _inputs[name].reset(new InputPort());
        _inputElemSize[name] = BufferChunk::elemSize(ti);
    }
    void setupOutput(const size_t idx, const std::type_info & = typeid(void))
    {
        _outputs[key(idx)].reset(new OutputPort());
    }
    void setupOutput(const std::string &name,
                     const std::type_info & = typeid(void))
    {
        _outputs[name].reset(new OutputPort());
    }

    InputPort *input(const size_t idx) { return _inputs.at(key(idx)).get(); }
    OutputPort *output(const size_t idx)
    {
        return _outputs.at(key(idx)).get();
    }
    OutputPort *output(const std::string &name)
    {
        return _outputs.at(name).get();
    }

    // ---- harness side -----------------------------------------------------
    std::map<std::string, double> signals;
    size_t inputElemSize(const size_t idx = 0)
    {
        return _inputElemSize.at(key(idx));
    }

private:
    static std::string key(const size_t idx)
    {
        std::ostringstream s;
        s << idx;
        return s.str();
    }
    std::map<std::string, std::unique_ptr<InputPort>> _inputs;
    std::map<std::string, std::unique_ptr<OutputPort>> _outputs;
    std::map<std::string, size_t> _inputElemSize;
};

class BlockRegistry
{
public:
    template <typename... Args>
    BlockRegistry(Args &&...)
    {
    }
};

}  // namespace Pothos
