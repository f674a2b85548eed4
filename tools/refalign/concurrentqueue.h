/* Minimal stand-in for moodycamel's concurrentqueue.h (fetched at
 * build time by the reference's setup, no network here).  ReadsQueue
 * is never used by the align-path oracle; only the member declaration
 * in readsqueue.hpp must parse. */
#pragma once
namespace moodycamel {
template <typename T>
class ConcurrentQueue {
public:
    ConcurrentQueue() {}
    explicit ConcurrentQueue(unsigned long) {}
    bool enqueue(T const&) { return false; }
    bool try_enqueue(T const&) { return false; }
    bool try_dequeue(T&) { return false; }
    unsigned long size_approx() const { return 0; }
};
}
